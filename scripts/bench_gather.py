"""Microbenchmark: XLA gather cost on TPU vs alternatives.

The integrator issues ~8 full-frame row gathers per bounce; this measures
what one costs and whether one-hot MXU matmul or other formulations win.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_gather.py
"""
import json
import time

import numpy as np

from tpuray.utils.platform import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp


def timed(fn, *args, iters=20, trials=3):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    n = 640_000  # rays at 800x800
    rng = np.random.default_rng(0)

    for t_rows, width in ((11264, 32), (11264, 8), (512, 32), (16, 8),
                          (2048 * 1024, 16)):
        table = jnp.asarray(rng.standard_normal((t_rows, width)), jnp.float32)
        idx = jnp.asarray(rng.integers(0, t_rows, n), jnp.int32)

        g = jax.jit(lambda tb, ix: tb[ix])
        t_gather = timed(g, table, idx)
        row = {"op": f"gather[{t_rows}x{width}]",
               "ms": round(t_gather * 1e3, 3),
               "ns_per_row": round(t_gather / n * 1e9, 2)}

        if t_rows <= 2048:
            # one-hot matmul alternative (exact for 0/1 in bf16)
            def onehot(tb, ix):
                oh = jax.nn.one_hot(ix, t_rows, dtype=jnp.bfloat16)
                return jnp.dot(oh, tb.astype(jnp.bfloat16),
                               preferred_element_type=jnp.float32)
            row["onehot_ms"] = round(timed(jax.jit(onehot), table, idx) * 1e3, 3)
        print(json.dumps(row))

    # sorted (coherent) indices: does locality help the TPU gather?
    table = jnp.asarray(rng.standard_normal((11264, 32)), jnp.float32)
    idx_sorted = jnp.sort(jnp.asarray(rng.integers(0, 11264, n), jnp.int32))
    g = jax.jit(lambda tb, ix: tb[ix])
    print(json.dumps({"op": "gather[11264x32] sorted idx",
                      "ms": round(timed(g, table, idx_sorted) * 1e3, 3)}))

    # 2D image gather (envmap-style): (1024, 2048, 16) by (y, x)
    img = jnp.asarray(rng.standard_normal((1024, 2048, 16)), jnp.float32)
    ys = jnp.asarray(rng.integers(0, 1024, n), jnp.int32)
    xs = jnp.asarray(rng.integers(0, 2048, n), jnp.int32)
    g2 = jax.jit(lambda im, y, x: im[y, x])
    print(json.dumps({"op": "gather2d[1024x2048x16]",
                      "ms": round(timed(g2, img, ys, xs) * 1e3, 3)}))
    # flattened-index formulation of the same gather
    g3 = jax.jit(lambda im, y, x: im.reshape(-1, 16)[y * 2048 + x])
    print(json.dumps({"op": "gather2d flat-index",
                      "ms": round(timed(g3, img, ys, xs) * 1e3, 3)}))


if __name__ == "__main__":
    main()
