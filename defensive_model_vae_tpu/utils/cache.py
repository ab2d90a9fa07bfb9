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


def ensure_deterministic_hash_seed() -> None:
    """Re-exec the current process with ``PYTHONHASHSEED=0`` if unset.

    The Pallas/Mosaic kernel lowering serializes hash-ordered structures,
    so the SAME kernel program lowers to a slightly different HLO in every
    process under Python hash randomization — each fresh process then
    MISSES the persistent compilation cache for the fused kernels,
    re-pays the ~20–40 s tunnel compile, and mints another ~200 KB
    near-duplicate ``.jax_cache`` entry (35 variants of the multi kernel
    had accumulated across rounds).  Measured: a ``PYTHONHASHSEED=0``
    process cache-HITS the entry an unpinned process misses; the non-
    Pallas programs (scan trainer, tracking, SAT sweep) are deterministic
    either way.

    Call this FIRST in ``main()`` of a benchmark/evidence entry point —
    never at import time (library importers must not be re-exec'd).  The
    child sees the env var and returns immediately, so this cannot loop.
    """
    import sys

    if not sys.flags.hash_randomization:
        # hashing already deterministic (PYTHONHASHSEED=0 honored, or
        # randomization disabled at build/flag level) — nothing to do.
        # sys.flags is the truth; the env var alone is not (python -E
        # ignores it)
        return
    orig = list(getattr(sys, "orig_argv", []) or [])
    if not orig or sys.flags.ignore_environment:
        # cannot reconstruct the command (embedded interpreter) or the
        # child would ignore PYTHONHASHSEED anyway (python -E): proceed
        # unpinned, but say so — an unpinned fused-kernel run re-pays the
        # tunnel compile and mints a fresh cache variant
        print(
            "note: hash randomization is live and cannot be pinned from "
            "here; fused-kernel compiles will miss the primed cache "
            "(run with PYTHONHASHSEED=0 — see CLAUDE.md)",
            file=sys.stderr,
        )
        return
    env = dict(os.environ, PYTHONHASHSEED="0")
    # orig_argv reconstructs the real command line (interpreter flags,
    # -m/-c forms) that sys.argv cannot; flush before the image is
    # replaced so block-buffered output isn't discarded
    sys.stdout.flush()
    sys.stderr.flush()
    os.execve(sys.executable, orig, env)


def enable_persistent_cache(cache_dir: str | None = None) -> str:
    """Point jax at the repo-local compilation cache (idempotent).

    Falls back to ``~/.cache/defensive_model_vae_tpu/jax`` when the package
    parent directory is not writable (installed, not editable).  Opt out
    with ``DEFVAE_NO_JAX_CACHE=1``.
    """
    global _enabled
    if os.environ.get("DEFVAE_NO_JAX_CACHE"):
        return ""
    import jax

    # Auto-enable ONLY when an accelerator platform is explicitly named
    # (e.g. the axon default "axon,cpu" set by sitecustomize, or
    # JAX_PLATFORMS=tpu); fail CLOSED otherwise.  XLA:CPU AOT entries bake
    # in the compiling host's machine features — reloading them elsewhere
    # risks SIGILL — and CPU compiles are fast anyway: the cache exists
    # for the minutes-long TPU tunnel compiles.  An explicit cache_dir is
    # a deliberate opt-in and bypasses the guard.
    if cache_dir is None:
        platforms = getattr(jax.config, "jax_platforms", None) or os.environ.get(
            "JAX_PLATFORMS", ""
        )
        names = [p.strip().lower() for p in str(platforms).split(",") if p.strip()]
        if not names or all(n == "cpu" for n in names):
            return ""

    if cache_dir is None:
        repo = os.path.dirname(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        )
        cache_dir = os.path.join(repo, ".jax_cache")
        if not (os.path.isdir(cache_dir) or os.access(repo, os.W_OK)):
            cache_dir = os.path.expanduser(
                "~/.cache/defensive_model_vae_tpu/jax"
            )
    if not _enabled:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _enabled = True
    else:
        active = jax.config.jax_compilation_cache_dir
        if active and cache_dir != active:
            # a later call cannot re-point the cache (entries from this
            # process may already be written); returning the requested dir
            # as if it took effect would silently pollute the active one
            raise RuntimeError(
                f"persistent cache already enabled at {active!r}; cannot "
                f"re-enable at {cache_dir!r} in the same process"
            )
    return cache_dir
