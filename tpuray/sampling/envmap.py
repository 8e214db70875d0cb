"""HDR environment light: direction mapping, radiance lookup, importance
sampling via the precomputed inverse-CDF cache, and solid-angle pdf.

Device-side re-derivation of the reference's envmap path
(path_tracing.frag:787-832) against the cache layout of
Utils/hdr_compute.h:90-99 (see tpuray.scene.types.EnvMap).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array
PI = np.float32(np.pi)


def bilinear_fetch(img: Array, u: Array, v: Array) -> Array:
    """GL_LINEAR / GL_CLAMP_TO_EDGE texture fetch.

    img: (H, W, C); u, v in [0,1] with texel centers at (i+0.5)/N.
    u indexes width, v indexes height (GL texture convention; the reference's
    env textures are clamped linear, Utils/help_func.h:22-32).
    Shapes of u/v broadcast; returns (*uv_shape, C).
    """
    h, w = img.shape[0], img.shape[1]
    x = u * w - 0.5
    y = v * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    x1i = jnp.clip(x0i + 1, 0, w - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    y1i = jnp.clip(y0i + 1, 0, h - 1)
    c00 = img[y0i, x0i]
    c10 = img[y0i, x1i]
    c01 = img[y1i, x0i]
    c11 = img[y1i, x1i]
    fx = fx[..., None]
    fy = fy[..., None]
    return ((c00 * (1 - fx) + c10 * fx) * (1 - fy)
            + (c01 * (1 - fx) + c11 * fx) * fy)


def dir_to_uv(d: Array) -> tuple[Array, Array]:
    """Equirect direction -> (u, v), path_tracing.frag:804-810 semantics:
    u = atan2(z, x)/2pi + 0.5, v = 1 - (asin(y)/pi + 0.5)."""
    n2 = jnp.sum(d * d, axis=-1, keepdims=True)
    d = d * jax.lax.rsqrt(jnp.maximum(n2, 1e-24))
    u = jnp.arctan2(d[..., 2], d[..., 0]) / (2.0 * PI) + 0.5
    v = 1.0 - (jnp.arcsin(jnp.clip(d[..., 1], -1.0, 1.0)) / PI + 0.5)
    return u, v


def env_radiance(image: Array, d: Array) -> Array:
    """hdrColor (path_tracing.frag:813-817): bilinear-fetch the envmap."""
    u, v = dir_to_uv(d)
    return bilinear_fetch(image, u, v)


def sample_env(cache: Array, xi1: Array, xi2: Array) -> Array:
    """SampleHdr (path_tracing.frag:787-799): xi -> world direction.

    Fetches (inv_cdf_x, inv_cdf_y) from the cache at (u=xi1, v=xi2); the
    cache layout makes xi2 select the column marginal and xi1 the row
    conditional. Returns (..., 3) directions.
    """
    xy = bilinear_fetch(cache, xi1, xi2)[..., :2]
    x = xy[..., 0]
    y = 1.0 - xy[..., 1]
    phi = 2.0 * PI * (x - 0.5)
    theta = PI * (y - 0.5)
    ct = jnp.cos(theta)
    return jnp.stack([ct * jnp.cos(phi), jnp.sin(theta), ct * jnp.sin(phi)], axis=-1)


def env_pdf(cache: Array, d: Array, hdr_resolution: int | Array,
            reference_quirks: bool = False) -> Array:
    """Solid-angle pdf of direction d under the texel-mass sampling scheme.

    A texel at row v spans solid angle (2pi/W)(pi/H)cos(theta_elev), so
    pdf_omega = pdf_texel * W*H / (2 pi^2 cos(theta_elev)).

    The reference (path_tracing.frag:821-832) divides by sin(theta_elev)
    instead — an elevation/polar-angle mixup that biases its envmap NEE by
    tan(theta); replicated only under reference_quirks. (Verified by the MC
    identity E[1/pdf] = 4pi in tests/test_envmap.py.)
    """
    u, v = dir_to_uv(d)
    pdf = bilinear_fetch(cache, u, v)[..., 2]
    theta = PI * (0.5 - v)  # elevation in [-pi/2, pi/2]
    jac = jnp.sin(theta) if reference_quirks else jnp.cos(theta)
    jac = jnp.maximum(jac, 1e-10)
    # W*H texels (the reference's W*W/2 assumes a 2:1 map); use actual dims
    del hdr_resolution
    wh = np.float32(cache.shape[0] * cache.shape[1])
    convert = wh / (2.0 * PI * PI * jac)
    return pdf * convert


def build_env_cache_jnp(image: Array) -> Array:
    """Device-side cache construction (cumsum + searchsorted), equivalent to
    the native builder — useful when the envmap itself is being optimized.
    """
    h, w = image.shape[0], image.shape[1]
    lum = (0.2 * image[..., 0] + 0.7 * image[..., 1] + 0.1 * image[..., 2])
    pdf = lum / jnp.sum(lum)
    pdf_x = jnp.sum(pdf, axis=0)
    cdf_x = jnp.cumsum(pdf_x)
    denom = jnp.where(pdf_x > 0, pdf_x, 1.0)
    cdf_y = jnp.cumsum(pdf / denom[None, :], axis=0)  # (h, w)

    xi1 = jnp.arange(h, dtype=jnp.float32) / h
    x = jnp.clip(jnp.searchsorted(cdf_x, xi1, side="left"), 0, w - 1)  # (h,)
    xi2 = jnp.arange(w, dtype=jnp.float32) / w
    cols = cdf_y[:, x]  # (h, h)
    y = jax.vmap(lambda col: jnp.searchsorted(col, xi2, side="left"), in_axes=1)(cols)
    y = jnp.clip(y, 0, h - 1)  # (h, w)
    cache = jnp.stack([
        jnp.broadcast_to((x.astype(jnp.float32) / w)[:, None], (h, w)),
        y.astype(jnp.float32) / h,
        pdf,
    ], axis=-1)
    return cache


# --------------------------------------------------------------------------
# Quad-packed variants: one gather per bilinear fetch (see
# tpuray.integrator.gather_tables). Numerically identical to the above.
# --------------------------------------------------------------------------

def env_radiance_packed(qimg: Array, d: Array) -> Array:
    from tpuray.integrator.gather_tables import bilinear_fetch_packed
    u, v = dir_to_uv(d)
    return bilinear_fetch_packed(qimg, u, v, c=3)


def sample_env_packed(qcache: Array, xi1: Array, xi2: Array) -> Array:
    from tpuray.integrator.gather_tables import bilinear_fetch_packed
    xy = bilinear_fetch_packed(qcache, xi1, xi2, c=3)[..., :2]
    x = xy[..., 0]
    y = 1.0 - xy[..., 1]
    phi = 2.0 * PI * (x - 0.5)
    theta = PI * (y - 0.5)
    ct = jnp.cos(theta)
    return jnp.stack([ct * jnp.cos(phi), jnp.sin(theta), ct * jnp.sin(phi)], axis=-1)


def env_pdf_packed(qcache: Array, d: Array,
                   reference_quirks: bool = False) -> Array:
    from tpuray.integrator.gather_tables import bilinear_fetch_packed
    u, v = dir_to_uv(d)
    pdf = bilinear_fetch_packed(qcache, u, v, c=3)[..., 2]
    theta = PI * (0.5 - v)
    jac = jnp.sin(theta) if reference_quirks else jnp.cos(theta)
    jac = jnp.maximum(jac, 1e-10)
    wh = np.float32(qcache.shape[0] * qcache.shape[1])
    convert = wh / (2.0 * PI * PI * jac)
    return pdf * convert


# --------------------------------------------------------------------------
# One-gather NEE table: the envmap NEE consumer needs (direction, radiance,
# pdf) for a stratified (xi1, xi2) — three full-frame gathers when done as
# cache + image + cache lookups (sample/radiance/pdf above). Since the
# sampled direction is a pure function of the cache texel, all three can be
# precomputed per texel and fetched with ONE row gather. Sampling is
# nearest-texel (the discrete inverse-CDF), which makes the packed
# (radiance, pdf) exact for the returned direction — unlike the reference's
# bilinear blend of inverse-CDF coordinates (path_tracing.frag:790), whose
# pdf lookup is only approximately consistent with its sample.
# --------------------------------------------------------------------------

def pack_env_nee_table(image: Array, cache: Array) -> Array:
    """(H, W, 8) rows: [Lx, Ly, Lz, Rr, Rg, Rb, pdf_omega, 0]."""
    sx = cache[..., 0]
    sy = cache[..., 1]
    x = sx
    y = 1.0 - sy
    phi = 2.0 * PI * (x - 0.5)
    theta = PI * (y - 0.5)
    ct = jnp.cos(theta)
    l = jnp.stack([ct * jnp.cos(phi), jnp.sin(theta), ct * jnp.sin(phi)],
                  axis=-1)
    rad = env_radiance(image, l)
    pdf = env_pdf(cache, l, 0)
    out = jnp.concatenate([l, rad, pdf[..., None],
                           jnp.zeros_like(pdf)[..., None]], axis=-1)
    return out.astype(jnp.float32)


def sample_env_nee(table: Array, xi1: Array, xi2: Array
                   ) -> tuple[Array, Array, Array]:
    """One gather -> (direction (...,3), radiance (...,3), pdf (...,)).

    Nearest-texel inverse-CDF draw: texel k covers xi in [k/N, (k+1)/N).
    xi1 indexes width, xi2 height (same convention as sample_env)."""
    h, w = table.shape[0], table.shape[1]
    cx = jnp.clip((xi1 * w).astype(jnp.int32), 0, w - 1)
    cy = jnp.clip((xi2 * h).astype(jnp.int32), 0, h - 1)
    row = table.reshape(h * w, 8)[cy * w + cx]
    return row[..., 0:3], row[..., 3:6], row[..., 6]
