"""Profiling helpers: wall timing with device sync + jax.profiler traces.

Heir of the reference's cout banners + nios counters (SURVEY.md §5 tracing
row): structured per-op spans, xplane traces on demand.
"""

from __future__ import annotations

import contextlib
import time

import jax


def timed(fn, *args, reps: int = 3, warmup: int = 1):
    """(best_seconds, last_output) with block_until_ready around each rep."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
        jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


@contextlib.contextmanager
def trace(logdir: str | None):
    """Capture an xplane trace for the enclosed block (no-op if logdir None).

    View with tensorboard or xprof; covers every kernel the block launches.
    """
    if logdir is None:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named span that shows up in profiler timelines."""
    with jax.profiler.TraceAnnotation(name):
        yield
