"""Persistent XLA compilation cache.

The wavefront graph is large and TPU compiles are expensive (minutes over a
remote tunnel); caching compiled executables on disk makes every process
after the first start in seconds."""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None):
    import jax

    cache_dir = (path or os.environ.get("JAX_COMPILATION_CACHE_DIR")
                 or os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
                     os.path.abspath(__file__)))), ".jax_cache"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
