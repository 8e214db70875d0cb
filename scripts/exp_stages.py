"""Per-stage timing of the denoise/frame pipeline on the current backend.

Times each stage standalone (individually jitted, realistic inputs) for the
static- and moving-camera paths, to localize frame cost.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/exp_stages.py [size]
"""
import json
import sys
import time

from tpuray.utils.platform import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp


def _sync(out):
    # the axon backend's block_until_ready can return before execution
    # finishes; a host transfer is the reliable fence (cf. bench.py)
    import numpy as np
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.reshape(-1)[:1])


def timed(fn, iters=10, trials=3):
    out = fn()
    _sync(out)
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        _sync(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 800
    h = w = size

    from tpuray.denoise.atrous import atrous_iteration
    from tpuray.denoise.modulate import modulate
    from tpuray.denoise.reproject import reproject
    from tpuray.denoise.taa import taa
    from tpuray.denoise.variance import estimate_variance
    from tpuray.scene.config import RenderConfig

    cfg = RenderConfig(width=w, height=h)

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 20)
    img3 = lambda k: jax.random.uniform(k, (h, w, 3))
    img1 = lambda k: jax.random.uniform(k, (h, w))
    unit = lambda k: (lambda v: v / jnp.linalg.norm(v, axis=-1, keepdims=True))(
        jax.random.uniform(k, (h, w, 3)) * 2 - 1)

    color, emission, albedo = img3(ks[0]), img3(ks[1]) * 0.1, img3(ks[2]) + 0.2
    motion = (jax.random.uniform(ks[3], (h, w, 2)) - 0.5) * 0.02
    normal, p_n = unit(ks[4]), unit(ks[10])
    lz, p_lz = img1(ks[5]) * 0.9, img1(ks[11]) * 0.9
    fwn, fwz = img1(ks[6]) * 0.1, img1(ks[7]) * 0.01
    p_il, p_var = img3(ks[8]), img1(ks[9])
    p_mom = jax.random.uniform(ks[12], (h, w, 2))
    p_hist = jnp.ones((h, w)) * 8
    var1 = img1(ks[13]) * 0.05

    rows = []

    def rec(stage, ms):
        rows.append({"stage": stage, "ms": round(ms, 2)})
        print(json.dumps(rows[-1]), flush=True)

    for static in (True, False):
        f = jax.jit(lambda c: reproject(
            c, emission, albedo, motion, normal, lz, fwn, fwz,
            p_il, p_var, p_n, p_lz, p_mom, p_hist, cfg,
            static_camera=static))
        rec(f"reproject_{'static' if static else 'moving'}",
            timed(lambda: f(color)))

    f = jax.jit(lambda c: estimate_variance(c, var1, p_mom, p_hist,
                                            normal, lz, fwz, cfg))
    rec("variance", timed(lambda: f(color)))

    f = jax.jit(lambda c: atrous_iteration(c, var1, normal, lz, fwz, 4, cfg))
    rec("atrous_xla_1iter", timed(lambda: f(color)))

    if jax.default_backend() != "cpu":
        from tpuray.kernels.atrous_pallas import atrous_chain
        f = jax.jit(lambda c: atrous_chain(c, var1, normal, lz, fwz, cfg))
        rec("atrous_pallas_chain5", timed(lambda: f(color)))

    # NB: a jitted XLA 5-iteration chain is omitted — its unrolled HLO once
    # OOM-killed the axon remote-compile helper; atrous_xla_1iter x5 bounds it

    f = jax.jit(lambda c: modulate(c, albedo, emission, lz))
    rec("modulate", timed(lambda: f(color)))

    for static in (True, False):
        f = jax.jit(lambda c: taa(c, p_il, motion, lz, jnp.int32(5),
                                  static_camera=static))
        rec(f"taa_{'static' if static else 'moving'}",
            timed(lambda: f(color)))

    f = jax.jit(lambda c: taa(c, p_il, motion, lz, jnp.int32(5),
                              tiled_fetch=True))
    rec("taa_moving_tiled", timed(lambda: f(color)))


if __name__ == "__main__":
    main()
