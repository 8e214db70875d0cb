"""RNG: Wang hash semantics, Sobol direction numbers & equidistribution,
Cranley-Patterson rotation."""
import numpy as np
import jax.numpy as jnp

from tpuray.sampling import rng


def wang_ref(seed: int) -> int:
    """Independent uint32 model of the reference hash (path_tracing.frag:438-445)."""
    M = 0xFFFFFFFF
    seed = (seed ^ 61) ^ (seed >> 16)
    seed = (seed * 9) & M
    seed = seed ^ (seed >> 4)
    seed = (seed * 0x27D4EB2D) & M
    seed = seed ^ (seed >> 15)
    return seed


def test_wang_hash_matches_uint32_model():
    for s in [1, 61, 12345, 0xDEADBEEF, 0xFFFFFFFF]:
        bits, _ = rng.wang_hash(jnp.asarray([s], jnp.uint32))
        assert int(bits[0]) == wang_ref(s)


def test_pixel_seed_formula():
    s = rng.pixel_seed(jnp.asarray([3], jnp.uint32), jnp.asarray([5], jnp.uint32), 7)
    expected = ((3 * 1973 + 5 * 9277 + 7 * 26699) | 1) & 0xFFFFFFFF
    assert int(s[0]) == expected


def test_rand_uniform_range():
    seed = rng.pixel_seed(jnp.arange(10000, dtype=jnp.uint32),
                          jnp.zeros(10000, jnp.uint32), 0)
    u, _ = rng.rand(seed)
    u = np.asarray(u)
    assert (u >= 0).all() and (u < 1).all()
    assert abs(u.mean() - 0.5) < 0.02


def test_sobol_first_dims():
    # dim 0 = van der Corput: index 1 -> 0.5, 2 -> 0.25, 3 -> 0.75
    assert abs(float(rng.sobol(0, 1)) - 0.5) < 1e-6
    assert abs(float(rng.sobol(0, 2)) - 0.25) < 1e-6
    assert abs(float(rng.sobol(0, 3)) - 0.75) < 1e-6
    # dim 1 m-sequence 1,3,5,15 -> first direction numbers
    V = rng.SOBOL_V
    assert V[1, 0] == 0x80000000 and V[1, 1] == 0xC0000000
    assert V[1, 2] == 0xA0000000 and V[1, 3] == 0xF0000000
    # dim 2 (poly x^2+x+1, m=[1,3]) continues 3, 9 (<<29, <<28)
    assert V[2, 2] == 0x60000000 and V[2, 3] == 0x90000000


def test_sobol_equidistribution():
    # first 256 points of (dim0, dim1) fill a 16x16 grid exactly once
    idx = rng.gray_code(jnp.arange(256, dtype=jnp.uint32))
    u = np.asarray(rng.sobol(0, idx))
    v = np.asarray(rng.sobol(1, idx))
    cells = (np.stack([u, v], -1) * 16).astype(int)
    ids = cells[:, 0] * 16 + cells[:, 1]
    assert len(np.unique(ids)) == 256


def test_cranley_patterson_wraps():
    p = jnp.asarray([0.9, 0.2])
    u = jnp.asarray([0.3])
    v = jnp.asarray([0.95])
    x, y = rng.cranley_patterson_rotate(p, u, v)
    np.testing.assert_allclose(float(x[0]), 0.2, atol=1e-6)
    np.testing.assert_allclose(float(y[0]), 0.15, atol=1e-5)


def test_sobol_vec2_stable_across_pixels():
    a = rng.sobol_vec2(5, 0)
    b = rng.sobol_vec2(5, 0)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = rng.sobol_vec2(6, 0)
    assert not np.allclose(np.asarray(a), np.asarray(c))


def test_halton_2_3_matches_reference_table():
    # The reference constant table (path_tracing.frag:38-47) is Halton(i)
    # for i = 8..1 descending in bases (2, 3).
    ref = np.array([
        [1 / 16, 8 / 9], [7 / 8, 5 / 9], [3 / 8, 2 / 9], [5 / 8, 7 / 9],
        [1 / 8, 4 / 9], [3 / 4, 1 / 9], [1 / 4, 2 / 3], [1 / 2, 1 / 3],
    ], np.float32)
    got = rng.halton_2_3(8)[::-1]
    np.testing.assert_allclose(got, ref, atol=1e-7)


def test_rand_sync_matches_wang_of_fixed_seed():
    w, h = 800, 800
    seed = ((w // 2) * 1973 + (h // 2) * 9277 + 114514 * 26699) & 0xFFFFFFFF
    seed |= 1
    expected = wang_ref(seed) / 4294967296.0
    assert abs(rng.rand_sync(w, h) - expected) < 1e-7
