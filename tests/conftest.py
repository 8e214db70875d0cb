"""Test configuration: force the CPU backend with 8 virtual devices so
multi-chip sharding paths are exercised without TPU hardware (SURVEY.md §4).

NOTE: this environment registers a TPU ('axon') PJRT plugin from
sitecustomize *before* conftest runs, so JAX_PLATFORMS env tricks don't work;
the config must be updated post-import. Tests must run on CPU — concurrent
processes serialize on the single TPU tunnel otherwise.
"""
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
