"""Persistent XLA compilation cache setup (shared by CLIs/bench/entry)."""

from __future__ import annotations

import os


def enable_compile_cache(cache_dir: str | None = None) -> None:
    """First run pays the multi-minute TPU compile; later runs start hot."""
    import jax

    cache_dir = cache_dir or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), ".jax_cache"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass
