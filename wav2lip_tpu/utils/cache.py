"""Persistent XLA compilation cache.

Generator/detector/train-step graphs take minutes to compile (axon remote
compile + a 1-CPU host); caching compiled executables on disk makes every run
after the first start in seconds. Called by all CLI entry points and
pipeline constructors; override the location with ``W2L_CACHE_DIR`` or
disable with ``W2L_CACHE_DIR=""``.
"""

from __future__ import annotations

import os

_done = False


def enable_compile_cache() -> None:
    global _done
    if _done:
        return
    _done = True
    cache_dir = os.environ.get(
        "W2L_CACHE_DIR",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))),
            ".jax_cache",
        ),
    )
    if not cache_dir:
        return
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
