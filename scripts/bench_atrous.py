"""Measure the SVGF a-trous chain on real TPU: Pallas fused kernel vs jnp.

Usage: python scripts/bench_atrous.py [H W]
Prints parity error and ms/chain (5 iterations) for both paths.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from tpuray.utils.platform import enable_compile_cache

enable_compile_cache()

from tpuray.denoise.atrous import atrous_iteration
from tpuray.kernels.atrous_pallas import atrous_chain
from tpuray.scene.config import RenderConfig


def jnp_chain(illum, variance, normal, z, fwz, cfg):
    for i in range(cfg.num_atrous_iterations):
        illum, variance = atrous_iteration(illum, variance, normal, z, fwz,
                                           step=1 << i, cfg=cfg)
    return illum, variance


def main():
    h, w = (int(sys.argv[1]), int(sys.argv[2])) if len(sys.argv) > 2 else (1080, 1920)
    cfg = RenderConfig(num_atrous_iterations=5)
    rng = np.random.default_rng(0)
    illum = jnp.asarray(rng.uniform(0, 4, (h, w, 3)), jnp.float32)
    var = jnp.asarray(rng.uniform(0, 1, (h, w)), jnp.float32)
    n = rng.normal(size=(h, w, 3))
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    n = jnp.asarray(n, jnp.float32)
    z = jnp.asarray(rng.uniform(0.05, 0.95, (h, w)), jnp.float32)
    fwz = jnp.asarray(rng.uniform(0, 0.02, (h, w)), jnp.float32)
    args = (illum, var, n, z, fwz)

    pal = jax.jit(lambda *a: atrous_chain(*a, cfg)[0])
    ref = jax.jit(lambda *a: jnp_chain(*a, cfg))

    pi, pv = pal(*args)
    ri, rv = ref(*args)
    err_i = float(jnp.max(jnp.abs(pi - ri)))
    err_v = float(jnp.max(jnp.abs(pv - rv)))
    print(f"max|illum diff|={err_i:.3e}  max|var diff|={err_v:.3e}")

    for name, fn in (("pallas", pal), ("jnp", ref)):
        out = fn(*args)
        np.asarray(out[0][:1, :1])  # sync
        iters = 20
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn(*args)
            np.asarray(out[0][:1, :1])
            best = min(best, (time.perf_counter() - t0) / iters)
        # roofline: bytes = 5 iters x (9 planes read + 4 written) x HW x 4B
        traffic = cfg.num_atrous_iterations * (9 + 4) * h * w * 4
        print(f"{name}: {best * 1e3:.3f} ms/chain ({h}x{w}, 5 iters), "
              f"~{traffic / best / 1e9:.0f} GB/s effective")


if __name__ == "__main__":
    main()
