"""Isolate the packet kernel's fixed per-grid-step overhead.

Three data points at 800x800 (157 packets):
  all_dead   — every lane t_max<0: the kernel does the root slab test and
               exits; time = pure grid-step overhead (incl. any SMEM table
               re-streaming per step).
  miss_root  — rays pointing away from the scene: root test fails.
  small_tables — same all_dead run with a tiny dummy scene (100 tris):
               if overhead scales with table size, the tables are being
               re-streamed into SMEM on every grid step.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/exp_overhead.py
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
    from tpuray.scene.procedural import make_test_scene

    scene = reference_default_scene()
    meta, aabb, tverts = jax.device_put(
        tp.pack_scene(scene.bvh, scene.triangles))
    n = 640_000
    key = jax.random.PRNGKey(0)
    d = jax.random.normal(key, (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    o = jnp.zeros((n, 3)) + jnp.asarray([5.0, 5.0, 5.0])

    tm_dead = jnp.full((n,), -1.0)
    f = lambda: tp.trace_packets(meta, aabb, tverts, o, d, tm_dead)
    print(json.dumps({"case": "all_dead_157pk", "ms": round(timed(f), 3)}),
          flush=True)

    # rays outside the scene pointing away: root slab fails for all lanes
    tm = jnp.full((n,), tp.INF)
    d_away = d * jnp.sign(jnp.sum(d * o, axis=-1, keepdims=True))
    f2 = lambda: tp.trace_packets(meta, aabb, tverts, o, d_away, tm)
    print(json.dumps({"case": "miss_root_157pk", "ms": round(timed(f2), 3)}),
          flush=True)

    small = make_test_scene(subdiv=0, env_width=16)
    m2, a2, t2 = jax.device_put(tp.pack_scene(small.bvh, small.triangles))
    print(json.dumps({"small_nodes": int(small.bvh.count),
                      "small_tris": int(small.triangles.count)}))
    f3 = lambda: tp.trace_packets(m2, a2, t2, o, d, tm_dead)
    print(json.dumps({"case": "all_dead_small_tables",
                      "ms": round(timed(f3), 3)}), flush=True)

    # visit-cost scaling: same rays, live, at full table size
    f4 = lambda: tp.trace_packets(m2, a2, t2, o, d, tm)
    print(json.dumps({"case": "live_small_scene",
                      "ms": round(timed(f4), 3)}), flush=True)


if __name__ == "__main__":
    main()
