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
    """Static-offset neighbor fetch with edge clamp (GL clamp-to-edge).

    Implemented with static slices + edge broadcast (never an index-array
    gather — those are slow on TPU even when the indices are affine)."""
    if dy > 0:
        img = jnp.concatenate(
            [img[dy:], jnp.broadcast_to(img[-1:], (dy,) + img.shape[1:])], axis=0)
    elif dy < 0:
        img = jnp.concatenate(
            [jnp.broadcast_to(img[:1], (-dy,) + img.shape[1:]), img[:dy]], axis=0)
    if dx > 0:
        img = jnp.concatenate(
            [img[:, dx:],
             jnp.broadcast_to(img[:, -1:], (img.shape[0], dx) + img.shape[2:])],
            axis=1)
    elif dx < 0:
        img = jnp.concatenate(
            [jnp.broadcast_to(img[:, :1], (img.shape[0], -dx) + img.shape[2:]),
             img[:, :dx]], axis=1)
    return img


def inside_mask(shape: tuple[int, int], dy: int, dx: int,
                row_window: tuple | None = None) -> Array:
    """True where pixel (y+dy, x+dx) is inside the image.

    row_window=(row0, global_h): the local array is a row shard (plus halo)
    of a taller image — local row i is global row row0+i and the vertical
    bounds test uses global_h, so a halo-extended shard computes exactly
    the single-device mask (tpuray.dist.frame)."""
    h, w = shape
    row0, gh = row_window if row_window is not None else (0, h)
    ys = jnp.arange(h) + row0 + dy
    xs = jnp.arange(w) + dx
    my = (ys >= 0) & (ys < gh)
    mx = (xs >= 0) & (xs < w)
    return my[:, None] & mx[None, :]
