"""Profiling + per-step timing hooks.

TPU counterpart of the reference's timing instrumentation (SURVEY §5.1:
``TimeMonitor`` callback.py:47-100, ``CalRunTimeCallback`` :175-253, FPS
prints, MindSpore SummaryCollector): ``jax.profiler`` traces viewable in
TensorBoard/Perfetto plus a host-side step timer with ETA.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax

__all__ = ["trace", "annotate", "StepTimer"]


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a ``jax.profiler`` trace for the enclosed steps.

    View with ``tensorboard --logdir <log_dir>`` (profile plugin) or load the
    .trace.json.gz in Perfetto.
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up on the trace timeline."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Wall-clock per-step timing + ETA (reference TimeMonitor semantics)."""

    def __init__(self, total_steps: Optional[int] = None, warmup: int = 1):
        self.total_steps = total_steps
        self.warmup = warmup  # first steps include compile; exclude from avg
        self.count = 0
        self._t0 = None
        self._elapsed = 0.0
        self._last = 0.0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self._last = time.perf_counter() - self._t0
        self.count += 1
        if self.count > self.warmup:
            self._elapsed += self._last

    @property
    def last_ms(self) -> float:
        return self._last * 1e3

    @property
    def avg_ms(self) -> float:
        steady = max(self.count - self.warmup, 1)
        return self._elapsed / steady * 1e3

    @property
    def eta_s(self) -> Optional[float]:
        if not self.total_steps or self.count <= self.warmup:
            return None
        return (self.total_steps - self.count) * self.avg_ms / 1e3

    def summary(self) -> str:
        eta = self.eta_s
        return (f"step {self.count}: {self.last_ms:.1f} ms "
                f"(avg {self.avg_ms:.1f} ms"
                + (f", ETA {eta / 60:.1f} min" if eta is not None else "") + ")")
