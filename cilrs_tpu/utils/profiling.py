"""Profiling: jax.profiler traces + phase step timing.

The reference's only performance surface is a per-run average-FPS print
(model/autonomous_drive.py:1664) and wall-clock epoch times. Here profiling is
first-class (SURVEY.md §5): `trace()` wraps a block in a jax.profiler trace
viewable in TensorBoard/XProf, and `StepTimer` accumulates per-phase wall times
with device synchronization so the numbers mean what they say.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace for the enclosed block."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Accumulates per-phase timings; `block=True` syncs the device first."""

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, block_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                jax.block_until_ready(block_on)
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> str:
        lines = ["phase timings:"]
        for name, total in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            n = self.counts[name]
            lines.append(f"  {name:24s} {total:8.3f}s total  {total / max(n,1) * 1e3:8.2f} ms/call  x{n}")
        return "\n".join(lines)
