"""Parity: MXU one-hot gather vs plain table[idx]."""
import jax.numpy as jnp
import numpy as np

from tpuray.kernels.gather_pallas import onehot_gather


def test_onehot_gather_matches_plain():
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.uniform(-8, 8, (1000, 26)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, 1000, 3000), jnp.int32)
    got = onehot_gather(table, idx, interpret=True)
    want = table[idx]
    # hi/lo bf16 split: ~2^-17 relative error
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-4)


def test_onehot_gather_coherent_indices():
    # coherent blocks (the ray-packet case): only 1-2 chunks visited
    rng = np.random.default_rng(1)
    table = jnp.asarray(rng.uniform(0, 1, (2048, 8)), jnp.float32)
    base = np.repeat(rng.integers(0, 2000, 4), 1024)
    idx = jnp.asarray(np.clip(base + rng.integers(0, 40, 4096), 0, 2047),
                      jnp.int32)
    got = onehot_gather(table, idx, interpret=True)
    np.testing.assert_allclose(got, table[idx], rtol=2e-5, atol=2e-4)


def test_onehot_gather_ragged_n():
    rng = np.random.default_rng(2)
    table = jnp.asarray(rng.uniform(0, 1, (600, 44)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, 600, 777), jnp.int32)
    got = onehot_gather(table, idx, interpret=True)
    assert got.shape == (777, 44)
    np.testing.assert_allclose(got, table[idx], rtol=2e-5, atol=2e-4)
