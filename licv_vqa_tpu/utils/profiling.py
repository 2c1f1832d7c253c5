"""Tracing / profiling hooks (SURVEY.md §5.1 — the reference has none).

Two layers:

- ``trace(log_dir)`` — context manager around ``jax.profiler`` producing a
  TensorBoard-loadable device trace (HLO timeline, HBM usage);
- ``StepTimer`` — cheap per-step wall-clock stats fed to the metrics sink,
  giving it/s and stragglers without a full trace.
"""

from __future__ import annotations

import contextlib
import time
from pathlib import Path
from typing import Iterator, Optional

import numpy as np


@contextlib.contextmanager
def trace(log_dir: str | Path, enabled: bool = True) -> Iterator[None]:
    if not enabled:
        yield
        return
    import jax

    Path(log_dir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region visible in the profiler timeline."""
    import jax

    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    def __init__(self, window: int = 50):
        self.window = window
        self._times: list[float] = []
        self._last: Optional[float] = None

    def tick(self) -> Optional[float]:
        now = time.perf_counter()
        dt = None
        if self._last is not None:
            dt = now - self._last
            self._times.append(dt)
            if len(self._times) > self.window:
                self._times.pop(0)
        self._last = now
        return dt

    @property
    def stats(self) -> dict:
        if not self._times:
            return {}
        arr = np.asarray(self._times)
        return {
            "step_time_mean_s": float(arr.mean()),
            "step_time_p50_s": float(np.percentile(arr, 50)),
            "step_time_p95_s": float(np.percentile(arr, 95)),
            "steps_per_sec": float(1.0 / max(arr.mean(), 1e-9)),
        }
