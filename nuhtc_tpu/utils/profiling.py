"""Profiling / tracing helpers (the reference has no tracer — SURVEY.md §5;
we provide jax.profiler integration + simple wall timers).

Usage:
    with trace("mask_stage", log_dir="/tmp/trace"):   # xprof/tensorboard trace
        out = step(params, batch)

    t = Timer(); ...; t.lap("rpn")  — prints cumulative laps.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional


@contextlib.contextmanager
def trace(name: str, log_dir: Optional[str] = None):
    """jax.profiler trace scope (viewable in tensorboard/xprof)."""
    import jax

    if log_dir:
        jax.profiler.start_trace(log_dir)
    try:
        with jax.profiler.TraceAnnotation(name):
            yield
    finally:
        if log_dir:
            jax.profiler.stop_trace()


class Timer:
    def __init__(self):
        self.t0 = time.perf_counter()
        self.last = self.t0
        self.laps = {}

    def lap(self, name: str) -> float:
        now = time.perf_counter()
        dt = now - self.last
        self.laps[name] = self.laps.get(name, 0.0) + dt
        self.last = now
        return dt

    def report(self) -> str:
        total = time.perf_counter() - self.t0
        lines = [f"{k}: {v:.3f}s ({100 * v / total:.0f}%)" for k, v in self.laps.items()]
        return f"total {total:.3f}s | " + " | ".join(lines)


class ThroughputMeter:
    """Tiles/sec counter for streaming loops (WSI stage B)."""

    def __init__(self, window: int = 50):
        self.window = window
        self.times = []
        self.counts = []

    def update(self, n: int):
        self.times.append(time.perf_counter())
        self.counts.append(n)
        if len(self.times) > self.window:
            self.times.pop(0)
            self.counts.pop(0)

    @property
    def rate(self) -> float:
        if len(self.times) < 2:
            return 0.0
        return sum(self.counts[1:]) / max(self.times[-1] - self.times[0], 1e-9)
