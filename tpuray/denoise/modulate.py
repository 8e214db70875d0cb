"""SVGF modulate: re-multiply filtered illumination by albedo and re-add
first-hit emission (shaders/svgf_modulate.frag:18-29); sky passes through."""
from __future__ import annotations

import jax.numpy as jnp


def modulate(illum, albedo, emission, linear_z):
    sky = (linear_z == 1.0)[..., None]
    return jnp.where(sky, illum, illum * albedo + emission)
