"""Measurement helpers that are honest on asynchronous runtimes.

Two traps this module guards against (both observed on the TPU runtime used here):

1. ``jax.block_until_ready`` can return before the computation actually finishes
   (dispatch acknowledgement != completion on tunneled runtimes) — timings taken
   that way undercount arbitrarily.  Only a device->host pull is a true barrier.
2. Repeated executions with bit-identical inputs can be memoized by the runtime,
   so benchmark loops must cycle distinct inputs (or chain each iteration on the
   previous one's output).
"""

from __future__ import annotations

import time

import jax
import numpy as np


def hsync(tree) -> None:
    """True completion barrier: pull one element of every leaf to the host."""
    for leaf in jax.tree.leaves(tree):
        if hasattr(leaf, "shape"):
            np.asarray(jax.device_get(leaf.ravel()[:1] if leaf.ndim else leaf))


def hsync_one(tree) -> None:
    """Pull one element of the FIRST array leaf (one RPC; enough of a barrier for
    a chained computation, whose leaves complete together)."""
    for leaf in jax.tree.leaves(tree):
        if hasattr(leaf, "shape"):
            np.asarray(jax.device_get(leaf.ravel()[:1] if leaf.ndim else leaf))
            return


def time_chained(step, state, iters: int):
    """Time ``iters`` chained applications of ``step`` (each consumes the last
    output, so the chain self-serializes); ends with a single-leaf host pull.
    Returns (seconds_per_iter, final_state)."""
    hsync_one(state)
    t0 = time.perf_counter()
    for _ in range(iters):
        state = step(state)
    hsync_one(state)
    return (time.perf_counter() - t0) / iters, state


def time_fn(fn, argsets, reps: int = 10, warm: int = 2):
    """Median per-call seconds of ``fn`` over distinct argsets, one host pull per
    call (unchained dispatches need a per-call barrier — see module docstring)."""
    for a in argsets[:warm]:
        hsync(fn(*a))
    times = []
    for r in range(reps):
        a = argsets[r % len(argsets)]
        t0 = time.perf_counter()
        hsync(fn(*a))
        times.append(time.perf_counter() - t0)
    return float(np.median(times))
