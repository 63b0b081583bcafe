"""Profiling helpers: wall timing with device sync + jax.profiler traces.

Heir of the reference's cout banners + nios counters (SURVEY.md §5 tracing
row): structured per-op spans, xplane traces on demand.
"""

from __future__ import annotations

import contextlib
import time

import jax


def timed(fn, *args, reps: int = 3, warmup: int = 1):
    """(best_seconds, last_output) with block_until_ready around each rep.

    WARNING: block_until_ready does NOT reliably fence execution on the
    axon-tunneled TPU in this image (PERF_NOTES.md) — use fence()/
    timed_steady() for trustworthy device timings there.
    """
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


def fence(out) -> float:
    """Force full execution: device->host readback of one output scalar
    (cannot complete before the program does, unlike block_until_ready on
    the axon tunnel)."""
    import jax.numpy as jnp

    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.asarray(leaf).reshape(-1)[0])


def timed_steady(fn, args, k: int = 6, reps: int = 2):
    """(per_iter_seconds, compile_seconds) — K-dispatch steady state.

    Queues k async dispatches and fences only the last output, then
    subtracts a single-dispatch run: cancels the fixed per-call round trip
    (~26 ms through the axon tunnel) without wrapping the program in
    lax.fori_loop (loop-wrapped sort programs compile pathologically).

    Estimator (r4): the minima of the direct t1/tk measurements are taken
    INDEPENDENTLY before subtracting — best-of over per-rep differences
    biases low under the tunnel's one-sided noise (a spiked t1 makes its
    rep's difference undershoot; small programs "measured" 0.00 ms).
    """
    f = jax.jit(fn)
    t0 = time.perf_counter()
    fence(f(*args))
    compile_s = time.perf_counter() - t0
    t1s, tks = [], []
    for _ in range(reps):
        t0 = time.perf_counter()
        fence(f(*args))
        t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        out = None
        for _ in range(k):
            out = f(*args)
        fence(out)
        tks.append(time.perf_counter() - t0)
    per = max((min(tks) - min(t1s)) / (k - 1), 1e-9)
    return per, compile_s


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
