"""Parity: fused Pallas a-trous chain vs the jnp reference implementation."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuray.denoise.atrous import atrous_iteration
from tpuray.kernels.atrous_pallas import atrous_chain
from tpuray.scene.config import RenderConfig


def _inputs(h, w, seed=0, with_sky=True):
    rng = np.random.default_rng(seed)
    illum = rng.uniform(0.0, 4.0, (h, w, 3)).astype(np.float32)
    variance = rng.uniform(0.0, 1.0, (h, w)).astype(np.float32)
    n = rng.normal(size=(h, w, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    z = rng.uniform(0.05, 0.95, (h, w)).astype(np.float32)
    if with_sky:
        z[: h // 5, : w // 3] = 1.0  # envmap region: passthrough
    fwz = rng.uniform(0.0, 0.02, (h, w)).astype(np.float32)
    return (jnp.asarray(illum), jnp.asarray(variance), jnp.asarray(n),
            jnp.asarray(z), jnp.asarray(fwz))


def _jnp_chain(illum, variance, normal, z, fwz, cfg):
    tap = (illum, variance)
    for i in range(cfg.num_atrous_iterations):
        illum, variance = atrous_iteration(illum, variance, normal, z, fwz,
                                           step=1 << i, cfg=cfg)
        if i == cfg.history_atrous_tap:
            tap = (illum, variance)
    return (illum, variance), tap


@pytest.mark.parametrize("quirks", [False, True])
def test_atrous_chain_matches_jnp(quirks):
    cfg = RenderConfig(num_atrous_iterations=3, reference_quirks=quirks)
    args = _inputs(48, 72, seed=1 + quirks)
    (fi, fv), (ti, tv) = atrous_chain(*args, cfg, interpret=True)
    (ri, rv), (rti, rtv) = _jnp_chain(*args, cfg)
    np.testing.assert_allclose(fi, ri, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(fv, rv, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(ti, rti, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(tv, rtv, rtol=2e-5, atol=2e-5)


def test_atrous_chain_multi_tile():
    # image larger than one tile in both dims and not tile-aligned
    cfg = RenderConfig(num_atrous_iterations=2)
    h, w = 150, 300  # TH=128/TW=256 -> 2x2 tiles with ragged edges
    args = _inputs(h, w, seed=7)
    (fi, fv), _ = atrous_chain(*args, cfg, interpret=True)
    (ri, rv), _ = _jnp_chain(*args, cfg)
    np.testing.assert_allclose(fi, ri, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(fv, rv, rtol=2e-5, atol=2e-5)


def test_atrous_chain_tap_before_any_iteration():
    # tap index beyond the last iteration: falls back to pre-filter input
    cfg = RenderConfig(num_atrous_iterations=1, history_atrous_tap=1)
    args = _inputs(32, 64, seed=3)
    (_, _), (ti, tv) = atrous_chain(*args, cfg, interpret=True)
    np.testing.assert_allclose(ti, args[0], rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(tv, args[1], rtol=1e-6, atol=1e-6)
