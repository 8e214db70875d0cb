"""SVGF spatial variance fallback (shaders/svgf_variance.frag).

Pixels with fewer than 4 frames of history estimate illumination and moments
with a 7x7 cross-bilateral filter (edge-stopping in depth, normal and
luminance) and boost the variance by 4/h; others pass through unchanged.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from tpuray.denoise.common import inside_mask, luminance, shift2d
from tpuray.scene.config import RenderConfig

Array = jax.Array


def edge_stopping_weight(z_c, z_p, phi_depth, n_c, n_p, phi_normal,
                         l_c, l_p, phi_illum):
    """computeWeight (svgf_variance.frag:23-35 == svgf_Atrous.frag:43-55)."""
    w_normal = jnp.clip(jnp.sum(n_c * n_p, axis=-1), 0.0, 1.0) ** phi_normal
    w_z = jnp.where(phi_depth == 0.0, 0.0, jnp.abs(z_c - z_p) / jnp.where(phi_depth == 0.0, 1.0, phi_depth))
    # phi_illum can be exactly 0 (3x3-blurred variance slightly negative
    # from E[l^2]-E[l]^2 cancellation -> sqrt clamps to 0); 0/0 on a flat
    # dark region would poison the filter with NaN
    w_l = jnp.abs(l_c - l_p) / jnp.maximum(phi_illum, 1e-10)
    return jnp.exp(-jnp.maximum(w_l, 0.0) - jnp.maximum(w_z, 0.0)) * w_normal


class VarianceOutput(NamedTuple):
    illum: Array     # (H, W, 3)
    variance: Array  # (H, W)


def estimate_variance(illum: Array, variance: Array, moments: Array,
                      history_len: Array, normal: Array, linear_z: Array,
                      fwidth_z: Array, cfg: RenderConfig,
                      row_window: tuple | None = None) -> VarianceOutput:
    # row_window=(row0, global_h): halo-extended row shard; global-coord
    # boundary masks (tpuray.dist.frame)
    shape = illum.shape[:2]
    sky = linear_z == 1.0
    needs = (history_len < 4.0) & ~sky

    l_center = luminance(illum)
    phi_depth = jnp.maximum(fwidth_z, 1e-8) * 3.0

    sum_w = jnp.zeros(shape, jnp.float32)
    sum_illum = jnp.zeros(illum.shape, jnp.float32)
    sum_mom = jnp.zeros(shape + (2,), jnp.float32)
    radius = 3
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            inside = inside_mask(shape, dy, dx, row_window)
            il_p = shift2d(illum, dy, dx)
            mo_p = shift2d(moments, dy, dx)[..., :2]
            l_p = luminance(il_p)
            z_p = shift2d(linear_z, dy, dx)
            n_p = shift2d(normal, dy, dx)
            dist = float((dx * dx + dy * dy) ** 0.5)
            wgt = edge_stopping_weight(
                linear_z, z_p, phi_depth * dist, normal, n_p, cfg.sigma_n,
                l_center, l_p, cfg.sigma_l)
            wgt = jnp.where(inside, wgt, 0.0)
            sum_w = sum_w + wgt
            sum_illum = sum_illum + wgt[..., None] * il_p
            sum_mom = sum_mom + wgt[..., None] * mo_p

    sum_w = jnp.maximum(sum_w, 1e-6)
    est_illum = sum_illum / sum_w[..., None]
    est_mom = sum_mom / sum_w[..., None]
    est_var = (est_mom[..., 1] - est_mom[..., 0] ** 2) * (
        4.0 / jnp.maximum(history_len, 1e-3))

    out_illum = jnp.where(needs[..., None], est_illum, illum)
    out_var = jnp.where(needs, est_var, variance)
    return VarianceOutput(illum=out_illum, variance=out_var)
