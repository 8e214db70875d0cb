"""Scratch experiment harness: time trace_packets kernel variants on TPU.

Usage: python scripts/exp_trace.py [leaf_size ...]
Times the kernel-direct closest-hit trace at 800x800 primaries (same
protocol as bench.py) for each builder leaf size, with MAX_LEAF matched.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from tpuray.utils.platform import enable_compile_cache
enable_compile_cache()

from tpuray.scene.builder import reference_default_scene
from tpuray.scene.camera import OrbitCamera
from tpuray.render.tiling import tile_pixel_coords
from tpuray.kernels import trace_pallas as tp


def make_rays(width=800, height=800):
    cam = OrbitCamera(width=width, height=height).snapshot()
    xx, yy = tile_pixel_coords(height, width)
    xs = (2.0 * (xx.astype(jnp.float32) + 0.5) / width - 1.0) * cam.tan_half_fov
    ys = -(2.0 * (yy.astype(jnp.float32) + 0.5) / height - 1.0) * cam.tan_half_fov
    d_cam = jnp.stack([xs, ys, -jnp.ones_like(xs)], axis=-1)
    d = jnp.einsum("ij,nj->ni", cam.cam_to_world, d_cam)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    o = jnp.broadcast_to(cam.eye, (xx.shape[0], 3))
    return o, d


def bench(fn, o, d, iters=20):
    t, idx = fn(o, d)
    ref = np.asarray(idx)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            t, idx = fn(o, d)
        _ = np.asarray(t[:1])
        best = min(best, (time.perf_counter() - t0) / iters)
    return best, ref


def main():
    # args: "leaf" or "leaf:rows" tokens
    variants = []
    for a in sys.argv[1:] or ["8"]:
        parts = a.split(":")
        variants.append((int(parts[0]), int(parts[1]) if len(parts) > 1 else 32))
    o, d = make_rays()
    n = o.shape[0]
    ref_idx = None
    scenes = {}
    for ls, rows in variants:
        if ls not in scenes:
            scenes[ls] = reference_default_scene(leaf_size=ls)
        scene = scenes[ls]
        tp.MAX_LEAF = ls if ls > 0 else 8
        tp.PACKET_ROWS = rows
        tp.PACKET = rows * tp.PACKET_LANES
        jax.clear_caches()
        meta, aabb, tverts = jax.device_put(
            tp.pack_scene(scene.bvh, scene.triangles))
        tm = jnp.full((n,), tp.INF)
        fn = jax.jit(lambda o, d: tp.trace_packets(
            meta, aabb, tverts, o, d, tm, common_origin=True))
        dt, idx = bench(fn, o, d)
        hits = int((idx >= 0).sum())
        print(f"leaf={ls} rows={rows}: {n/dt/1e6:.1f} Mrays/s  "
              f"({dt*1e3:.3f} ms, hits={hits})", flush=True)


if __name__ == "__main__":
    main()
