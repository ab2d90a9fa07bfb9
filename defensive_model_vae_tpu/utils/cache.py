"""Persistent XLA compilation cache.

Cold compiles through the axon remote-compile tunnel cost minutes; the
repo-local ``.jax_cache`` (primed and committed) turns repeat compiles of
the same program shapes into fast cache loads.  Call
:func:`enable_persistent_cache` before the first jit execution — it is
idempotent and safe to call from multiple entry points (bench.py, the
DNDA device sweep, the CLI).
"""

from __future__ import annotations

import os

_enabled = False


def enable_persistent_cache(cache_dir: str | None = None) -> str:
    """Point jax at the repo-local compilation cache (idempotent)."""
    global _enabled
    import jax

    if cache_dir is None:
        cache_dir = os.path.join(
            os.path.dirname(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
            ),
            ".jax_cache",
        )
    if not _enabled:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _enabled = True
    return cache_dir
