"""Envmap importance sampling: direction mapping, pdf correctness via MC."""
import numpy as np
import jax.numpy as jnp

from tpuray.io.fallback import env_cache_py
from tpuray.sampling import envmap as env
from tpuray.scene.builder import procedural_room_envmap


def test_dir_uv_roundtrip():
    rng = np.random.default_rng(5)
    d = rng.standard_normal((100, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    u, v = env.dir_to_uv(jnp.asarray(d))
    u, v = np.asarray(u), np.asarray(v)
    assert (u >= 0).all() and (u <= 1).all()
    assert (v >= 0).all() and (v <= 1).all()
    # reconstruct direction from uv (inverse of toSphericalCoord)
    phi = (u - 0.5) * 2 * np.pi
    theta = (0.5 - v) * np.pi  # v=0 -> +pi/2 (up)
    d2 = np.stack([np.cos(theta) * np.cos(phi), np.sin(theta),
                   np.cos(theta) * np.sin(phi)], -1)
    np.testing.assert_allclose(d2, d, atol=1e-4)


def test_sampled_directions_match_pdf():
    """E[1/pdf] over importance samples = total solid angle 4*pi."""
    img = procedural_room_envmap(128)
    cache = jnp.asarray(env_cache_py(img))
    rng = np.random.default_rng(11)
    n = 100_000
    xi1 = jnp.asarray(rng.random(n, dtype=np.float64).astype(np.float32))
    xi2 = jnp.asarray(rng.random(n, dtype=np.float64).astype(np.float32))
    d = env.sample_env(cache, xi1, xi2)
    p = np.asarray(env.env_pdf(cache, d, img.shape[1]))
    assert (p > 0).all()
    est = (1.0 / p).mean()
    assert abs(est - 4 * np.pi) / (4 * np.pi) < 0.15, est


def test_mc_radiance_matches_texel_sum():
    """E[L(w)/pdf(w)] = \\int L dw, computed directly from texels."""
    img = procedural_room_envmap(128)
    cache = jnp.asarray(env_cache_py(img))
    image = jnp.asarray(img)
    rng = np.random.default_rng(13)
    n = 200_000
    xi1 = jnp.asarray(rng.random(n).astype(np.float32))
    xi2 = jnp.asarray(rng.random(n).astype(np.float32))
    d = env.sample_env(cache, xi1, xi2)
    rad = np.asarray(env.env_radiance(image, d))
    p = np.asarray(env.env_pdf(cache, d, img.shape[1]))[:, None]
    est = (rad / p).mean(axis=0)

    h, w = img.shape[:2]
    v = (np.arange(h) + 0.5) / h
    theta = np.pi * (0.5 - v)
    dw = (2 * np.pi / w) * (np.pi / h) * np.cos(theta)  # texel solid angle
    ref = (img * dw[:, None, None]).sum(axis=(0, 1))
    np.testing.assert_allclose(est, ref, rtol=0.08)


def test_bright_regions_sampled_more():
    img = procedural_room_envmap(128)
    cache = jnp.asarray(env_cache_py(img))
    rng = np.random.default_rng(17)
    n = 50_000
    d = env.sample_env(cache, jnp.asarray(rng.random(n).astype(np.float32)),
                       jnp.asarray(rng.random(n).astype(np.float32)))
    u, v = env.dir_to_uv(d)
    lum_at = np.asarray(env.bilinear_fetch(jnp.asarray(img), u, v)).mean(-1)
    # average luminance at sampled locations must far exceed the map average
    assert lum_at.mean() > 3.0 * img.mean()


def test_device_cache_matches_host():
    img = procedural_room_envmap(64)
    host = env_cache_py(img)
    dev = np.asarray(env.build_env_cache_jnp(jnp.asarray(img)))
    np.testing.assert_allclose(dev, host, atol=2e-5)
