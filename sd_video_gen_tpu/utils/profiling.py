"""Tracing/profiling utilities (the reference had only tqdm bars —
SURVEY.md §5.1).

  - ``trace(logdir)``: jax.profiler trace context for TensorBoard-viewable
    device traces.
  - ``StepTimer``: wall-clock step/epoch timing with jitter-free device sync
    on demand; emits into the MetricsLogger stream.
  - ``annotate(name)``: TraceAnnotation so custom regions show up in traces.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir: str = "/tmp/sdvg_trace"):
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Accumulates step wall times; ``summary()`` gives mean/p50/p95 ms."""

    def __init__(self, sync_every: int = 0):
        self.times: list[float] = []
        self.sync_every = sync_every
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, sync_value=None):
        if sync_value is not None:
            jax.block_until_ready(sync_value)
        if self._t0 is not None:
            self.times.append(time.perf_counter() - self._t0)
            self._t0 = None

    def summary(self) -> dict:
        if not self.times:
            return {}
        xs = sorted(self.times)
        n = len(xs)
        return {
            "step_ms_mean": 1e3 * sum(xs) / n,
            "step_ms_p50": 1e3 * xs[n // 2],
            "step_ms_p95": 1e3 * xs[min(n - 1, int(n * 0.95))],
            "steps_timed": n,
        }

    def reset(self):
        self.times.clear()
