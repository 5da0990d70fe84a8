"""Profiling / tracing hooks (SURVEY.md §5: the reference has none; on TPU
the first-class metrics are per-phase wall-clock and env-steps/s).

* ``trace(dir)`` — context manager around ``jax.profiler`` producing a
  TensorBoard-loadable trace of device execution.
* ``annotate(name)`` — named trace span (shows up in the profiler timeline).
* ``Timer`` — lightweight per-phase wall-clock aggregator used by the trainer
  when ``ETMPPO_TIMING=1``.
"""
from __future__ import annotations

import contextlib
import os
import time
from collections import defaultdict
from typing import Dict, Iterator

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


class Timer:
    """Accumulates wall-clock per named phase; blocking-safe on device work
    only if the caller block_until_ready()s inside the span."""

    def __init__(self) -> None:
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def span(self, name: str) -> Iterator[None]:
        start = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - start
            self.counts[name] += 1

    def summary(self) -> Dict[str, float]:
        return {
            name: self.totals[name] / max(self.counts[name], 1)
            for name in self.totals}
