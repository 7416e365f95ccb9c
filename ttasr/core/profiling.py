"""Profiling/tracing hooks.

The reference has none beyond wall-clock prints (SURVEY.md §5).  Here:
- ``trace(dir)``: context manager around ``jax.profiler`` (view in
  TensorBoard / xprof),
- ``StageTimer``: per-stage wall-clock accounting for the serving loop
  (mel / encode / decode / postprocess), exported as a dict for the
  health endpoints.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a jax profiler trace into ``log_dir``."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region visible in profiler traces."""
    import jax

    return jax.profiler.TraceAnnotation(name)


class StageTimer:
    """Accumulates wall-clock per named stage; thread-safe enough for the
    single-writer serving loop."""

    def __init__(self) -> None:
        self._total: Dict[str, float] = defaultdict(float)
        self._count: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._total[name] += time.perf_counter() - t0
            self._count[name] += 1

    def snapshot(self) -> Dict[str, dict]:
        return {
            name: {
                "total_s": round(self._total[name], 4),
                "count": self._count[name],
                "mean_ms": round(1000 * self._total[name] / self._count[name], 2)
                if self._count[name] else 0.0,
            }
            for name in self._total
        }

    def reset(self) -> None:
        self._total.clear()
        self._count.clear()
