"""SVGF edge-aware a-trous wavelet filter (shaders/svgf_Atrous.frag).

One iteration = a dilated 5x5 B3-spline stencil (weights [1, 2/3, 1/6]) with
edge-stopping functions in depth, normal and luminance; the variance channel
is filtered with squared weights (svgf_Atrous.frag:118-125). phi_illum is
scaled by the sqrt of a 3x3-blurred variance.

The reference's variance "blur" reads the center texel for all 9 taps
(svgf_Atrous.frag:36), degenerating to identity; the correct blur is the
default here, the quirk available via cfg.reference_quirks.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from tpuray.denoise.common import inside_mask, luminance, shift2d
from tpuray.denoise.variance import edge_stopping_weight
from tpuray.scene.config import RenderConfig

Array = jax.Array

_KERNEL_1D = (1.0, 2.0 / 3.0, 1.0 / 6.0)
# 3x3 variance pre-blur (svgf_Atrous.frag:24-27)
_VAR_KERNEL = {(0, 0): 1 / 4, (1, 0): 1 / 8, (0, 1): 1 / 8, (1, 1): 1 / 16}


def blur_variance_3x3(variance: Array, reference_quirks: bool) -> Array:
    if reference_quirks:
        return variance  # center texel read 9 times, kernel sums to 1
    out = jnp.zeros_like(variance)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            k = _VAR_KERNEL[(abs(dx), abs(dy))]
            out = out + k * shift2d(variance, dy, dx)
    return out


def atrous_iteration(illum: Array, variance: Array, normal: Array,
                     linear_z: Array, fwidth_z: Array, step: int,
                     cfg: RenderConfig,
                     row_window: tuple | None = None) -> tuple[Array, Array]:
    """One wavelet iteration at dilation `step` (1<<i). Returns
    (filtered illum, filtered variance).

    row_window=(row0, global_h): inputs are a halo-extended row shard of a
    taller image; boundary masks use global coordinates (tpuray.dist.frame).
    """
    shape = illum.shape[:2]
    sky = linear_z == 1.0

    l_center = luminance(illum)
    var_blur = blur_variance_3x3(variance, cfg.reference_quirks)
    phi_l = cfg.sigma_l * jnp.sqrt(jnp.maximum(1e-10, 1e-10 + var_blur))
    phi_depth = jnp.maximum(fwidth_z, 1e-8) * step

    sum_w = jnp.ones(shape, jnp.float32)           # center weight 1
    sum_illum = illum
    sum_var = variance                              # center, squared weight 1
    for yy in (-2, -1, 0, 1, 2):
        for xx in (-2, -1, 0, 1, 2):
            if xx == 0 and yy == 0:
                continue
            dy, dx = yy * step, xx * step
            inside = inside_mask(shape, dy, dx, row_window)
            il_p = shift2d(illum, dy, dx)
            var_p = shift2d(variance, dy, dx)
            l_p = luminance(il_p)
            z_p = shift2d(linear_z, dy, dx)
            n_p = shift2d(normal, dy, dx)
            kernel = _KERNEL_1D[abs(xx)] * _KERNEL_1D[abs(yy)]
            dist = float((xx * xx + yy * yy) ** 0.5)
            wgt = edge_stopping_weight(
                linear_z, z_p, phi_depth * dist, normal, n_p, cfg.sigma_n,
                l_center, l_p, phi_l)
            wgt = jnp.where(inside, wgt * kernel, 0.0)
            sum_w = sum_w + wgt
            sum_illum = sum_illum + wgt[..., None] * il_p
            sum_var = sum_var + wgt * wgt * var_p

    out_illum = sum_illum / sum_w[..., None]
    out_var = sum_var / (sum_w * sum_w)
    out_illum = jnp.where(sky[..., None], illum, out_illum)
    out_var = jnp.where(sky, variance, out_var)
    return out_illum, out_var
