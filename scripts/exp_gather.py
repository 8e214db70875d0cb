"""Microbench: XLA full-frame gather cost on TPU vs row width & row count.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/exp_gather.py
"""
import json
import time

import jax
import jax.numpy as jnp

from tpuray.utils.platform import enable_compile_cache

enable_compile_cache()


def _sync(out):
    import numpy as np
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.reshape(-1)[:1])


def timed(fn, iters=20, trials=3):
    out = fn()
    _sync(out)
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        _sync(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    n = 800 * 800
    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (n,), 0, n)
    # locally-smooth indices (reproject-like): identity + small jitter
    idx_smooth = jnp.clip(jnp.arange(n) + jax.random.randint(key, (n,), -900, 900), 0, n - 1)
    for width in (1, 4, 8, 12, 16, 20, 24, 32, 48, 64):
        tbl = jax.random.uniform(jax.random.PRNGKey(1), (n, width))
        for name, ii in (("rand", idx), ("smooth", idx_smooth)):
            f = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
            ms = timed(lambda: f(tbl, ii)) * 1e3
            print(json.dumps({"gather_width": width, "idx": name,
                              "ms": round(ms, 3)}), flush=True)
    # 2D-form gather (H, W, C) with (H, W) yi/xi like reproject does
    h = w = 800
    for c in (12, 48):
        img = jax.random.uniform(jax.random.PRNGKey(2), (h, w, c))
        yi = jax.random.randint(key, (h, w), 0, h)
        xi = jax.random.randint(key, (h, w), 0, w)
        f2 = jax.jit(lambda a, y, x: a[y, x])
        ms = timed(lambda: f2(img, yi, xi)) * 1e3
        print(json.dumps({"gather2d_c": c, "ms": round(ms, 3)}), flush=True)


if __name__ == "__main__":
    main()
