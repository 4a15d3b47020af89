"""Profiling helpers — the observability tier the reference never had (SURVEY.md §5).

Thin, dependency-free wrappers around ``jax.profiler`` plus a phase-timer for host
loops.  The reference disables even timestamp queries (`particle_render.rs:94`); here a
trace of any frame window is one context manager away.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/rps_trace"):
    """Capture a jax.profiler trace (view with TensorBoard / xprof)."""
    with jax.profiler.trace(log_dir):
        yield log_dir


class PhaseTimer:
    """Wall-clock per-phase accumulator with device sync at phase ends.

    >>> t = PhaseTimer()
    >>> with t.phase("step"): state = step(state, params)
    >>> with t.phase("render"): img = render(state)
    >>> t.report()
    """

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        """Time a block; callers should block_until_ready inside for device phases."""
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> dict:
        stats = {
            name: {
                "total_s": round(total, 4),
                "calls": self.counts[name],
                "mean_ms": round(total / self.counts[name] * 1e3, 3),
            }
            for name, total in sorted(self.totals.items())
        }
        for name, s in stats.items():
            print(f"{name:20s} {s['mean_ms']:10.3f} ms/call x{s['calls']}")
        return stats
