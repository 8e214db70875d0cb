"""TPU experiment: chunk-streaming traversal on beyond-SMEM scenes.

Measures the chunked Pallas kernel vs the XLA wavefront on procedural
scenes from ~32k to ~130k triangles (the single-tree packet kernel cannot
run these at all: SMEM ceiling ~15-20k tris), coherent camera primaries +
incoherent hashed-direction secondaries.

PYTHONPATH=/root/repo:/root/.axon_site python scripts/exp_chunked.py [subdiv]
"""
from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from tpuray.utils.platform import enable_compile_cache


def bench(fn, sync, iters=5, trials=3):
    fn()
    sync()
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(iters):
            fn()
        sync()
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    enable_compile_cache()
    subdiv = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    chunk_tris = int(sys.argv[2]) if len(sys.argv) > 2 else 3072
    from tpuray.scene.procedural import make_large_scene
    from tpuray.scene.camera import OrbitCamera
    from tpuray.render.tiling import tile_pixel_coords_np
    from tpuray.kernels import trace_chunked as tc

    t0 = time.perf_counter()
    scene = make_large_scene(n_spheres=25, subdiv=subdiv, env_width=64,
                             max_chunk_tris=chunk_tris)
    build_s = time.perf_counter() - t0
    bvh = scene.bvh
    print(json.dumps({"tris": int(scene.triangles.count),
                      "nodes": int(bvh.count),
                      "chunks": int(bvh.n_chunks),
                      "chunk_nodes": bvh.chunk_nodes,
                      "chunk_tris": bvh.chunk_tris,
                      "fits": tc.chunk_fits_smem(bvh.chunk_nodes,
                                                 bvh.chunk_tris),
                      "build_s": round(build_s, 2)}), flush=True)

    cam = OrbitCamera(width=800, height=800, radius=4.0).snapshot()
    xx, yy = tile_pixel_coords_np(800, 800)
    n = int(xx.shape[0])
    xs = ((2.0 * (xx.astype(np.float32) + 0.5) / 800 - 1.0)
          * float(cam.tan_half_fov))
    ys = (-(2.0 * (yy.astype(np.float32) + 0.5) / 800 - 1.0)
          * float(cam.tan_half_fov))
    d_cam = np.stack([xs, ys, -np.ones_like(xs)], axis=-1)
    d_np = d_cam @ np.asarray(cam.cam_to_world, np.float32).T
    d_np /= np.linalg.norm(d_np, axis=-1, keepdims=True)
    o = jax.device_put(jnp.broadcast_to(
        jnp.asarray(np.asarray(cam.eye, np.float32)), (n, 3)))
    d = jax.device_put(jnp.asarray(d_np))
    tm = jax.device_put(jnp.full((n,), tc.INF))

    meta, aabb, tverts = jax.jit(tc.pack_forest)(bvh, scene.triangles)

    state = {}

    def run_coh():
        state["c"] = tc._trace_chunked_cj(meta, aabb, tverts, o, d, tm,
                                          bvh.chunk_nodes, bvh.chunk_tris,
                                          False, True)

    def sync_c():
        np.asarray(state["c"][0][:1])

    dt = bench(run_coh, sync_c, iters=3, trials=2)
    hits = float(np.mean(np.asarray(state["c"][1]) >= 0))
    print(json.dumps({"coherent_ms": round(dt * 1e3, 2),
                      "mrays_s": round(n / dt / 1e6, 1),
                      "hit_frac": round(hits, 3)}), flush=True)

    # correctness spot-check vs XLA wavefront on a subsample
    try:
        from tpuray.integrator.intersect import trace as trace_xla
        sub = slice(0, 8192)
        t_x, i_x = jax.jit(trace_xla)(bvh, scene.triangles, o[sub], d[sub])
        ok = bool(np.array_equal(np.asarray(i_x),
                                 np.asarray(state["c"][1])[sub]))
        print(json.dumps({"match_xla": ok}), flush=True)
    except Exception as e:
        print(json.dumps({"match_xla": repr(e)[:150]}), flush=True)

    # incoherent secondaries
    @jax.jit
    def incoherent_inputs(o, d, t):
        p = o + d * jnp.minimum(t, 10.0)[..., None]
        i = jnp.arange(n, dtype=jnp.uint32)

        def h(x):
            x = (x ^ jnp.uint32(61)) ^ (x >> 16)
            x = x * jnp.uint32(9)
            x = x ^ (x >> 4)
            x = x * jnp.uint32(0x27d4eb2d)
            return (x ^ (x >> 15)).astype(jnp.uint32)

        u1 = h(i).astype(jnp.float32) / np.float32(2**32)
        u2 = h(i * jnp.uint32(7919)).astype(jnp.float32) / np.float32(2**32)
        ct = 1.0 - 2.0 * u1
        st = jnp.sqrt(jnp.maximum(0.0, 1.0 - ct * ct))
        phi = 2.0 * np.pi * u2
        return p, jnp.stack([st * jnp.cos(phi), ct, st * jnp.sin(phi)], -1)

    p_inc, d_inc = incoherent_inputs(o, d, state["c"][0])

    def run_inc():
        state["i"] = tc._trace_chunked_cj(meta, aabb, tverts, p_inc, d_inc,
                                          tm, bvh.chunk_nodes, bvh.chunk_tris,
                                          False, False)

    def sync_i():
        np.asarray(state["i"][0][:1])

    dt_i = bench(run_inc, sync_i, iters=1, trials=1)
    print(json.dumps({"incoherent_ms": round(dt_i * 1e3, 2),
                      "mrays_s": round(n / dt_i / 1e6, 1)}), flush=True)

    # XLA wavefront comparison timing (the old beyond-SMEM fallback).
    # DISABLED by default: at 131k tris this path crashes the TPU worker
    # ("kernel fault") and wedges the tunnel; pass --xla to run it anyway.
    if "--xla" not in sys.argv:
        return
    try:
        nx = 65536
        def run_xla():
            state["x"] = jax.jit(trace_xla)(bvh, scene.triangles,
                                            o[:nx], d[:nx])

        def sync_x():
            np.asarray(state["x"][0][:1])

        dt_x = bench(run_xla, sync_x, iters=1, trials=2)
        print(json.dumps({"xla_coherent_ms_65k": round(dt_x * 1e3, 2),
                          "mrays_s": round(nx / dt_x / 1e6, 1),
                          "speedup_vs_chunked": round((dt_x / nx) / (dt / n), 1)}),
              flush=True)
    except Exception as e:
        print(json.dumps({"xla_coherent": repr(e)[:150]}), flush=True)


if __name__ == "__main__":
    main()
