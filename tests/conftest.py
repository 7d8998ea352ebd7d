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


def _preflight():
    """Self-diagnose environment resets up front (CLAUDE.md round-4 notes):
    a venv reset silently drops the editable install, which only surfaces
    as a ModuleNotFoundError deep inside subprocess tests (test_serving,
    test_distributed) whose workers run outside the repo cwd. Repair it
    here (or fail with one actionable message) instead."""
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    probe = subprocess.run(
        [sys.executable, "-c", "import xggm_tpu"],
        cwd="/", capture_output=True, text=True)
    if probe.returncode != 0:
        fix = subprocess.run(
            [sys.executable, "-m", "pip", "install", "-e", repo,
             "--no-deps", "--no-build-isolation", "-q"],
            capture_output=True, text=True)
        re_probe = subprocess.run(
            [sys.executable, "-c", "import xggm_tpu"],
            cwd="/", capture_output=True, text=True)
        if re_probe.returncode != 0:
            raise pytest.UsageError(
                "xggm_tpu is not importable outside the repo cwd (the "
                "editable install vanished - venv reset?) and automatic "
                f"`pip install -e {repo}` did not fix it:\n"
                f"{fix.stderr[-800:]}\n{re_probe.stderr[-400:]}")


_preflight()

# Reference mount: parity/goldens tooling imports it live. Tests that need
# it use this flag to skip with a clear message rather than erroring.
REFERENCE_DIR = "/root/reference"
HAVE_REFERENCE = os.path.isdir(os.path.join(REFERENCE_DIR, "src"))


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(0)
