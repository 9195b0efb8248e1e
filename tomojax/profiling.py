"""Tracing / profiling / observability.

The reference has none of this (SURVEY.md §5.1: tqdm bars are the only
runtime visibility). The BASELINE.json north star requires voxels/s/chip
accounting, so this module provides:

  * `trace(dir)` — context manager around `jax.profiler` emitting a
    TensorBoard-loadable XPlane trace of the device timeline.
  * `IterationMeter` — per-iteration wall-clock + voxel-iters/s counters
    with a one-line summary (used by bench.py and the examples).
  * `annotate(name)` — `jax.profiler.TraceAnnotation` passthrough so solver
    phases show up named in the trace.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import List, Optional


@contextlib.contextmanager
def trace(log_dir: str, host: bool = False):
    """Capture a device trace viewable in TensorBoard/XProf."""
    import jax

    jax.profiler.start_trace(log_dir, create_perfetto_link=False)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    import jax

    return jax.profiler.TraceAnnotation(name)


@dataclass
class IterationMeter:
    """Voxels/s accounting (BASELINE.md 'voxels/s/chip' metric)."""

    voxels: int
    name: str = "iter"
    times: List[float] = field(default_factory=list)
    _t0: Optional[float] = None

    def start(self):
        self._t0 = time.perf_counter()
        return self

    def lap(self):
        now = time.perf_counter()
        if self._t0 is not None:
            self.times.append(now - self._t0)
        self._t0 = now

    @property
    def mean_s(self) -> float:
        # skip the first lap (compile)
        laps = self.times[1:] if len(self.times) > 1 else self.times
        return sum(laps) / max(len(laps), 1)

    @property
    def voxel_iters_per_s(self) -> float:
        m = self.mean_s
        return self.voxels / m if m > 0 else 0.0

    def summary(self) -> str:
        return (
            f"{self.name}: {len(self.times)} laps, "
            f"{self.mean_s * 1e3:.1f} ms/iter, "
            f"{self.voxel_iters_per_s / 1e6:.1f} Mvoxel-iters/s"
        )
