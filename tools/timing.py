"""LEGACY timing protocol — superseded by utils/profiling.timed_steady.

Nothing in the repo calls this module any more (r5): the fori-loop
differencing protocol below cancels tunnel overhead exactly, but wrapping
*sort* programs in ``lax.fori_loop`` has been observed to compile
pathologically at the remote compile service (utils/profiling.py
docstring), and the production estimator — K queued dispatches fenced by
a device->host readback, independent minima (``timed_steady``) — measures
the same steady state without loop-wrapping.  Kept as the historical
record of the tunnel facts below; use ``timed_steady`` for new work.

Original doc: Truthful timing through the axon TPU tunnel.

Measured tunnel facts (tools/bench_primitives.py, /tmp/async_test.py):

* ``jax.block_until_ready`` does NOT wait for device execution — a chained
  ``fori_loop`` of 16 one-million-key sorts "completes" in 0.1 ms under it.
  Only fetching result bytes to the host (``np.asarray``) forces execution.
* One call + fetch costs ~30-60 ms of tunnel round-trip regardless of the
  work inside.  Naive per-call timing therefore measures the tunnel: the
  round-1 "design point" table (gather 32 ms, scatter 59 ms, sort 0.2 ms)
  was tunnel overhead plus noise, not chip behavior.

Protocol here: run K iterations of the op chained inside ONE jitted
``lax.fori_loop`` (data derived from a folded PRNG key each iteration, the
carry folded into a scalar that is fetched), for K and 2K; per-iteration
device time = (T(2K) - T(K)) / K, which cancels dispatch, fetch, and any
constant tunnel term exactly.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def _fetch(x) -> float:
    return float(np.asarray(x))


def chain_time(step, k: int = 8, reps: int = 3) -> tuple[float, float, float]:
    """Per-iteration device time of `step`, tunnel overhead differenced away.

    step(key, carry: u32) -> u32 carry. Must derive its operands from `key`
    and fold its result into the carry (keeps XLA from hoisting/DCE).
    Returns (per_iter_seconds, T_k, T_2k).
    """

    def run(n, seed):
        def body(i, carry):
            key = jax.random.fold_in(jax.random.PRNGKey(0), seed + i)
            return step(key, carry)

        return jax.lax.fori_loop(0, n, body, seed)

    g1 = jax.jit(lambda s: run(k, s))
    g2 = jax.jit(lambda s: run(2 * k, s))
    _fetch(g1(jnp.uint32(0)))  # compile + first real exec
    _fetch(g2(jnp.uint32(0)))

    def best(g, base):
        b = float("inf")
        for r in range(reps):
            s = jnp.uint32(base + (r + 1) * 1000)
            t0 = time.perf_counter()
            _fetch(g(s))
            b = min(b, time.perf_counter() - t0)
        return b

    t1 = best(g1, 10_000)
    t2 = best(g2, 20_000)
    return (t2 - t1) / k, t1, t2


def call_time(fn, make, reps: int = 3) -> tuple[float, float]:
    """Wall time of one call incl. tunnel round-trip (fetches a byte).

    fn must return something np.asarray-able (fetch forces execution).
    Returns (best_seconds, compile_seconds). Use for end-to-end numbers
    where the per-call overhead is part of the story, not for design points.
    """
    f = jax.jit(fn)
    inputs = [make(i) for i in range(reps + 1)]
    t0 = time.perf_counter()
    np.asarray(jax.tree.leaves(f(*inputs[0]))[0])
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for i in range(1, reps + 1):
        t0 = time.perf_counter()
        np.asarray(jax.tree.leaves(f(*inputs[i]))[0])
        best = min(best, time.perf_counter() - t0)
    return best, compile_s
