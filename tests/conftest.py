"""Test config: force an 8-device virtual CPU platform BEFORE jax imports so
the SPMD mesh paths are exercised without TPU hardware (SURVEY.md §4)."""
import os

# Force CPU even when the session env pins JAX_PLATFORMS to a TPU platform.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The session's sitecustomize may import jax and pin JAX_PLATFORMS to a TPU
# platform before this conftest runs; the config update below wins as long as
# no backend has been initialized yet.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

# Persistent compilation cache: repeated test runs skip XLA recompiles.
_CACHE_DIR = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(0)
