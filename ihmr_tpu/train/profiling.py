"""Profiling/tracing utilities.

The reference's only telemetry is hand-rolled wall-clock counters
(SURVEY.md §5.1); those live in ihmr_tpu.train.stats. This module adds the
TPU-native deep-profiling layer: jax.profiler traces viewable in
TensorBoard/Perfetto, plus annotation helpers for the run loops.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str, enabled: bool = True) -> Iterator[None]:
    """Capture a device trace for the enclosed block:

        with profiling.trace("log/profile"):
            run_some_steps()

    Open the resulting directory with TensorBoard's profile plugin or
    xprof/Perfetto."""
    if not enabled:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside a trace (shows up on the timeline)."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Lightweight steady-state step timer with compile-skip.

    Skips the first ``warmup`` measurements (compiles), then keeps a running
    mean/min. block_until_ready must be handled by the caller.
    """

    def __init__(self, warmup: int = 1):
        self.warmup = warmup
        self.times = []
        self._skipped = 0
        self._start: Optional[float] = None

    def __enter__(self):
        self._start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._start
        if self._skipped < self.warmup:
            self._skipped += 1
        else:
            self.times.append(dt)

    @property
    def mean(self) -> float:
        return sum(self.times) / len(self.times) if self.times else float("nan")

    @property
    def best(self) -> float:
        return min(self.times) if self.times else float("nan")
