"""Profiling hooks (SURVEY.md §5: the reference has none; we add them).

Thin wrappers over jax.profiler so training scripts can capture device
traces viewable in TensorBoard/Perfetto, plus a simple step timer that
reports steps/sec and device time.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: Optional[str]) -> Iterator[None]:
    """Capture a device trace into log_dir (no-op when log_dir is None)."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling steps/sec with warmup-skip (first step includes compile)."""

    def __init__(self, skip_first: int = 1):
        self.skip_first = skip_first
        self.count = 0
        self.total = 0.0
        self._last = None

    def start(self):
        self._last = time.perf_counter()

    def stop(self):
        dt = time.perf_counter() - self._last
        self.count += 1
        if self.count > self.skip_first:
            self.total += dt
        return dt

    @property
    def steps_per_sec(self) -> float:
        effective = self.count - self.skip_first
        if effective <= 0 or self.total == 0:
            return 0.0
        return effective / self.total
