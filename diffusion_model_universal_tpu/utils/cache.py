"""Persistent XLA compilation cache setup.

TPU compiles here go through a remote-compile service (~minutes for the
large train-step programs); the persistent cache makes every repeated
invocation (bench runs, CLI restarts, resumed training) start in seconds.
Call :func:`enable_compilation_cache` before the first jit execution.
"""

from __future__ import annotations

import os


def enable_compilation_cache(cache_dir: str = "/root/.jax_compile_cache"
                             ) -> None:
    try:
        import jax
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # cache is an optimization, never a requirement
