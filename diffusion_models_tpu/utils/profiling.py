"""Profiling / tracing helpers (SURVEY.md §5.1: the reference has none; the
TPU build adds optional `jax.profiler` capture around the train step).

Usage:
    with trace("/tmp/tb_trace"):          # view in TensorBoard→Profile
        state, loss = train_step(...)

    timer = StepTimer()
    for ...:
        with timer:
            state, loss = train_step(...); jax.block_until_ready(loss)
    print(timer.summary())
"""

from __future__ import annotations

import contextlib
import time

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    """Capture an XLA/TPU profiler trace for the enclosed block."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up in profiler timelines."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Wall-clock step timing with percentile summary."""

    def __init__(self):
        self.times = []
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t0)
        return False

    def summary(self, skip_first: int = 1) -> dict:
        ts = np.asarray(self.times[skip_first:] or self.times)
        return {
            "steps": len(ts),
            "mean_s": float(ts.mean()),
            "p50_s": float(np.percentile(ts, 50)),
            "p95_s": float(np.percentile(ts, 95)),
            "steps_per_sec": float(1.0 / ts.mean()) if ts.mean() > 0 else 0.0,
        }
