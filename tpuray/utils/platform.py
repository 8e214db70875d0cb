"""Backend selection helpers.

This container registers the TPU PJRT plugin from sitecustomize before any
user code runs, so JAX_PLATFORMS env settings are ineffective; use these to
pick a backend *after* jax import (before first computation).
"""
from __future__ import annotations

import jax


def use_cpu(n_devices: int = 1) -> None:
    """Switch JAX to the CPU backend with n virtual devices (for tests and
    multi-chip simulation)."""
    jax.config.update("jax_platforms", "cpu")
    if n_devices > 1:
        jax.config.update("jax_num_cpu_devices", n_devices)


def has_tpu() -> bool:
    try:
        return any(d.platform in ("tpu", "axon") for d in jax.devices())
    except RuntimeError:
        return False


def enable_compile_cache(path: str = "/root/repo/.jax_cache") -> None:
    """Persistent XLA compilation cache: TPU compiles (especially the first
    remote compile on axon) cost minutes; cache hits cost milliseconds."""
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # older jax without these flags
