"""Profiling and runtime observability.

The reference's only instrumentation is ``timeit`` wrappers in example
scripts (``examples/LambDipole.py:8-9,156-157``). Here:

- :func:`trace` — context manager around ``jax.profiler`` emitting a
  TensorBoard-loadable device trace;
- :class:`StepTimer` — cheap walltime/throughput counters for the step
  loop (steps/s, grid-point-steps/s), with percentile summaries.
"""

from __future__ import annotations

import contextlib
import time
from typing import List, Optional

import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler device trace into ``logdir``."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Walltime accounting for simulation steps."""

    def __init__(self, grid_points: int):
        self.grid_points = grid_points
        self.samples: List[float] = []
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.samples.append(time.perf_counter() - self._t0)
        self._t0 = None

    @property
    def steps(self) -> int:
        return len(self.samples)

    def summary(self) -> dict:
        if not self.samples:
            return {}
        s = np.asarray(self.samples)
        med = float(np.median(s))
        return {
            "steps": int(s.size),
            "median_s": med,
            "p10_s": float(np.percentile(s, 10)),
            "p90_s": float(np.percentile(s, 90)),
            "steps_per_s": 1.0 / med,
            "grid_point_steps_per_s": self.grid_points / med,
        }
