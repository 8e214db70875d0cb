"""Measure ONE packet-rows variant (isolated process: a kernel crash can
wedge the TPU tunnel, so each variant runs alone).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/exp_rows_one.py <rows> [case]
case: coh | inc | anyhit | dead (default: all)
"""
import json
import sys
import time

from tpuray.utils.platform import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np

from tpuray.kernels import trace_pallas as tp


def timed(fn, iters=20, trials=3):
    out = fn()
    np.asarray(out[0][:1])
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        np.asarray(out[0][:1])
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def main():
    rows = int(sys.argv[1])
    which = sys.argv[2] if len(sys.argv) > 2 else "all"

    from tpuray.scene.builder import reference_default_scene
    from tpuray.scene.camera import OrbitCamera
    from tpuray.render.tiling import tile_pixel_coords

    h = w = 800
    scene = reference_default_scene()
    meta, aabb, tverts = jax.device_put(
        tp.pack_scene(scene.bvh, scene.triangles))
    cam = OrbitCamera(width=w, height=h).snapshot()
    xx, yy = tile_pixel_coords(h, w)
    n = int(xx.shape[0])
    xs = (2.0 * (xx.astype(jnp.float32) + 0.5) / w - 1.0) * cam.tan_half_fov
    ys = -(2.0 * (yy.astype(jnp.float32) + 0.5) / h - 1.0) * cam.tan_half_fov
    d_cam = jnp.stack([xs, ys, -jnp.ones_like(xs)], axis=-1)
    d = jnp.einsum("ij,nj->ni", cam.cam_to_world, d_cam)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    o = jnp.broadcast_to(cam.eye, (n, 3))
    tm = jnp.full((n,), tp.INF)
    key = jax.random.PRNGKey(0)
    v = jax.random.normal(key, (n, 3))
    d_inc = v / jnp.linalg.norm(v, axis=-1, keepdims=True)

    out = {"rows": rows}
    if which in ("all", "coh"):
        fc = lambda: tp.trace_packets(meta, aabb, tverts, o, d, tm,
                                      common_origin=True, rows=rows)
        ms = timed(fc)
        out["coherent_ms"] = round(ms, 2)
        out["coh_mrays"] = round(n / ms / 1e3, 1)
        print(json.dumps(out), flush=True)
    t0v, _ = tp.trace_packets(meta, aabb, tverts, o, d, tm,
                              common_origin=True, rows=rows)
    p = o + d * jnp.minimum(t0v, 10.0)[..., None]
    if which in ("all", "inc"):
        fi = lambda: tp.trace_packets(meta, aabb, tverts, p, d_inc, tm,
                                      rows=rows)
        ms = timed(fi)
        out["incoherent_ms"] = round(ms, 2)
        out["inc_mrays"] = round(n / ms / 1e3, 1)
        print(json.dumps(out), flush=True)
    if which in ("all", "anyhit"):
        fa = lambda: tp.trace_packets(meta, aabb, tverts, p, d_inc, tm,
                                      any_hit=True, rows=rows)
        out["anyhit_ms"] = round(timed(fa), 2)
        print(json.dumps(out), flush=True)
    if which in ("all", "dead"):
        tm_dead = jnp.full((n,), -1.0)
        fd = lambda: tp.trace_packets(meta, aabb, tverts, o, d, tm_dead,
                                      rows=rows)
        out["dead_ms"] = round(timed(fd), 3)
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
