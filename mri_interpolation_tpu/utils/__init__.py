"""Runtime utilities: compilation cache, profiling, debug helpers."""

from __future__ import annotations

import os

import jax

__all__ = ["setup_compilation_cache", "enable_nan_debugging"]


def setup_compilation_cache(cache_dir: str = "/root/.cache/jax_comp", min_compile_secs: float = 1.0) -> None:
    """Enable JAX's persistent compilation cache.

    First XLA compile through this environment's TPU tunnel costs minutes;
    the persistent cache makes every subsequent process start warm. Called by
    the launcher and bench entry points.
    """
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", min_compile_secs)


def enable_nan_debugging() -> None:
    """NaN checking for every jitted computation — the framework's analogue of
    a sanitizer mode (SURVEY.md §5: the reference has none; JAX gives us one
    flag)."""
    jax.config.update("jax_debug_nans", True)
