"""Persistent XLA compilation cache setup.

First compile of the fused train step is tens of seconds on TPU and minutes
on CPU; the persistent cache makes every subsequent process start warm."""
from __future__ import annotations

import os


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    import jax

    if cache_dir is None:
        cache_dir = os.environ.get(
            "XGGM_JAX_CACHE",
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.dirname(os.path.abspath(__file__)))), ".jax_cache"))
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
