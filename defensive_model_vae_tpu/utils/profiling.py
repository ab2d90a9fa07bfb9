"""Profiling: per-stage wall-clock timers + JAX device profiler hook.

The reference has no tracing/profiling at all (SURVEY §5 — its only timer
computes ``time.time() - time.time()``, a bug).  This module provides the
rebuild's observability: a stage timer whose report is machine-readable,
and a context manager wrapping ``jax.profiler`` for device traces viewable
in TensorBoard/XProf.
"""

from __future__ import annotations

import contextlib
import json
import time
from typing import Dict, List, Optional


class StageTimer:
    """Accumulates named stage durations.

    >>> timer = StageTimer()
    >>> with timer.stage("train"):
    ...     ...
    >>> timer.report()          # {'train': {'seconds': ..., 'calls': 1}}
    """

    def __init__(self):
        self._acc: Dict[str, float] = {}
        self._calls: Dict[str, int] = {}
        self._order: List[str] = []

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            if name not in self._acc:
                self._acc[name] = 0.0
                self._calls[name] = 0
                self._order.append(name)
            self._acc[name] += dt
            self._calls[name] += 1

    def report(self) -> Dict[str, Dict[str, float]]:
        return {
            name: {"seconds": self._acc[name], "calls": self._calls[name]}
            for name in self._order
        }

    def dump(self, path: str):
        with open(path, "w") as f:
            json.dump(self.report(), f, indent=2)


@contextlib.contextmanager
def trace_to(log_dir: Optional[str]):
    """Device-level profiler trace (no-op when log_dir is None)."""
    if log_dir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
