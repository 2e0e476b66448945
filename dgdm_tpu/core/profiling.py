"""Tracing / profiling utilities.

The reference has only ad-hoc commented ``@profile`` decorators
(``sim/sim_3d.py:107``). Here: a step timer that logs through the metric sink
and a context manager around ``jax.profiler`` traces for xprof/tensorboard.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional


class StepTimer:
    """EWMA step timing with throughput accounting."""

    def __init__(self, alpha: float = 0.1):
        self.alpha = alpha
        self.ewma: Optional[float] = None
        self._t0: Optional[float] = None
        self._rate: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self.ewma = dt if self.ewma is None else (
            self.alpha * dt + (1 - self.alpha) * self.ewma
        )
        return False

    def metrics(self, items_per_step: float = 1.0) -> Dict[str, float]:
        if self.ewma is None:
            return {}
        return {
            "perf/step_seconds": self.ewma,
            "perf/items_per_second": items_per_step / self.ewma,
        }

    def tick(self, items: float = 1.0) -> None:
        """Mark the end of one step that processed ``items`` (loop style —
        the first tick only arms the timer)."""
        now = time.perf_counter()
        if self._t0 is not None:
            dt = now - self._t0
            rate = items / max(dt, 1e-9)
            self._rate = rate if getattr(self, "_rate", None) is None else (
                self.alpha * rate + (1 - self.alpha) * self._rate
            )
            self.ewma = dt if self.ewma is None else (
                self.alpha * dt + (1 - self.alpha) * self.ewma
            )
        self._t0 = now

    def rate(self) -> float:
        """EWMA items/second seen by tick()."""
        return float(getattr(self, "_rate", 0.0) or 0.0)


class TraceWindow:
    """Capture a ``jax.profiler`` trace for steps [start, stop) of a training
    loop — a bounded window after warmup so the trace holds steady-state
    steps, not compiles. Inert when ``log_dir`` is falsy."""

    def __init__(self, log_dir: Optional[str], start: int = 3, stop: int = 8):
        self.log_dir = log_dir
        self.start, self.stop = start, stop
        self._active = False

    def step(self, i: int) -> None:
        """Call once per loop step with the global step index."""
        if not self.log_dir:
            return
        import jax

        if not self._active and self.start <= i < self.stop:
            jax.profiler.start_trace(self.log_dir)
            self._active = True
        elif self._active and i >= self.stop:
            jax.profiler.stop_trace()
            self._active = False

    def close(self) -> None:
        if self._active:
            import jax

            jax.profiler.stop_trace()
            self._active = False


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context (view with xprof / tensorboard)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region for xprof timelines."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield
