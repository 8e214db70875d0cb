"""Shared image-space helpers for the denoiser stages."""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def luminance(c: Array) -> Array:
    """Rec. 709-ish luma used by the SVGF stages (svgf_reproject.frag:158-160)."""
    return 0.2125 * c[..., 0] + 0.7154 * c[..., 1] + 0.0721 * c[..., 2]


def gather2d(img: Array, yi: Array, xi: Array) -> Array:
    """Clamped nearest fetch img[yi, xi] for integer index maps (H', W')."""
    h, w = img.shape[0], img.shape[1]
    yi = jnp.clip(yi, 0, h - 1)
    xi = jnp.clip(xi, 0, w - 1)
    return img[yi, xi]


def shift2d(img: Array, dy: int, dx: int) -> Array:
    """Static-offset neighbor fetch with edge clamp (GL clamp-to-edge)."""
    h, w = img.shape[0], img.shape[1]
    ys = jnp.clip(jnp.arange(h) + dy, 0, h - 1)
    xs = jnp.clip(jnp.arange(w) + dx, 0, w - 1)
    return img[ys][:, xs]


def inside_mask(shape: tuple[int, int], dy: int, dx: int) -> Array:
    """True where pixel (y+dy, x+dx) is inside the image."""
    h, w = shape
    ys = jnp.arange(h) + dy
    xs = jnp.arange(w) + dx
    my = (ys >= 0) & (ys < h)
    mx = (xs >= 0) & (xs < w)
    return my[:, None] & mx[None, :]
