"""Packet-rows sweep: amortize the ~10.5us fixed per-grid-step overhead.

exp_overhead.py showed the kernel pays ~10.5us per packet before any
traversal work (157 packets = 1.65ms of the 2.26ms headline). Bigger
packets cut the step count; the union of visited nodes grows sublinearly.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/exp_rows.py
"""
import json
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
    tm_dead = jnp.full((n,), -1.0)

    key = jax.random.PRNGKey(0)
    v = jax.random.normal(key, (n, 3))
    d_inc = v / jnp.linalg.norm(v, axis=-1, keepdims=True)

    t0, _ = tp.trace_packets(meta, aabb, tverts, o, d, tm, common_origin=True)
    p = o + d * jnp.minimum(t0, 10.0)[..., None]

    ref_t = ref_i = None
    for rows in (32, 64, 128, 256):
        fc = lambda: tp.trace_packets(meta, aabb, tverts, o, d, tm,
                                      common_origin=True, rows=rows)
        fi = lambda: tp.trace_packets(meta, aabb, tverts, p, d_inc, tm,
                                      rows=rows)
        fa = lambda: tp.trace_packets(meta, aabb, tverts, p, d_inc, tm,
                                      any_hit=True, rows=rows)
        fd = lambda: tp.trace_packets(meta, aabb, tverts, o, d, tm_dead,
                                      rows=rows)
        tC, tI, tA, tD = timed(fc), timed(fi), timed(fa), timed(fd)
        tcur, icur = fi()
        if ref_t is None:
            ref_t, ref_i = np.asarray(tcur), np.asarray(icur)
            match = True
        else:
            match = bool(np.allclose(np.asarray(tcur), ref_t, rtol=1e-6))
        print(json.dumps({
            "rows": rows, "coherent_ms": round(tC, 2),
            "incoherent_ms": round(tI, 2), "anyhit_ms": round(tA, 2),
            "dead_ms": round(tD, 3),
            "coh_mrays": round(n / tC / 1e3, 1),
            "inc_mrays": round(n / tI / 1e3, 1),
            "match": match}), flush=True)


if __name__ == "__main__":
    main()
