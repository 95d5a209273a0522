"""Profiling helpers: phase timers + XLA trace capture.

Replaces the reference's ad-hoc cuda-event timing (train.py:143-144,200,375;
SURVEY.md §5.1) with `jax.profiler` traces (xplane dumps for
speed-of-light analysis) and blocking phase timers.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


class PhaseTimer:
    """Accumulating wall-clock timers with device sync at phase ends.

    with timer.phase("render", result):  blocks on `result` at exit.
    """

    def __init__(self):
        self.totals: dict = defaultdict(float)
        self.counts: dict = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, sync_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync_on is not None:
                jax.block_until_ready(sync_on)
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> dict:
        return {
            name: {
                "total_s": round(self.totals[name], 4),
                "count": self.counts[name],
                "mean_ms": round(
                    1000 * self.totals[name] / max(self.counts[name], 1), 3
                ),
            }
            for name in self.totals
        }


@contextlib.contextmanager
def xla_trace(log_dir: str):
    """Capture an XLA profiler trace (view in TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Trace annotation context (shows up in the xplane timeline)."""
    return jax.profiler.TraceAnnotation(name)
