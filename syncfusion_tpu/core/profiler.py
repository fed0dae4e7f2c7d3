"""Profiling / step timing — first-class here (the reference has none).

North-star metric: generated clips per minute per chip.  ``StepTimer`` gives
wall-per-step with device sync; ``trace`` wraps ``jax.profiler`` capture for
xprof/tensorboard inspection of HBM + MXU utilization.
"""

from __future__ import annotations

import contextlib
import time
from pathlib import Path
from typing import Iterator

import jax


@contextlib.contextmanager
def trace(log_dir: str | Path) -> Iterator[None]:
    Path(log_dir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Tracks per-step wall time; call ``tick`` after blocking on outputs."""

    def __init__(self, warmup: int = 1):
        self.warmup = warmup
        self.times: list[float] = []
        self._last: float | None = None
        self._steps = 0

    def start(self) -> None:
        self._last = time.perf_counter()

    def tick(self, result=None) -> float:
        if result is not None:
            jax.block_until_ready(result)
        now = time.perf_counter()
        dt = now - (self._last if self._last is not None else now)
        self._last = now
        self._steps += 1
        if self._steps > self.warmup:
            self.times.append(dt)
        return dt

    @property
    def mean(self) -> float:
        return sum(self.times) / max(len(self.times), 1)

    @property
    def best(self) -> float:
        return min(self.times) if self.times else float("nan")
