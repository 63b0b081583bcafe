#!/usr/bin/env python
"""Round-2 design experiments on the target TPU.

Questions this answers (each drives a concrete engine decision):
  Q1 compile scaling: does a program with 5 IDENTICAL 8-op sorts compile in
     ~1x or ~5x the single-sort time?  (placement-sort viability)
  Q2 sort runtime vs payload count: marginal ms per payload word at 1M rows
     (optimal place_words group size)
  Q3 gather runtime vs row width: per-row or per-byte cost?  (is one wide
     gather better than placement sorts after all)
  Q4 dispatch floor: N dependent steps inside ONE jit vs N separate calls
     (how bench.py should measure steady-state throughput)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp

from database_technology_algorithms_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache(tag="tpu")

N = 1 << 20


def timeit(name, fn, args, reps=3):
    f = jax.jit(fn)
    t0 = time.perf_counter()
    jax.block_until_ready(f(*args))
    compile_s = time.perf_counter() - t0
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:44s} {best*1e3:9.2f} ms  compile={compile_s:6.1f}s", flush=True)
    return best


def main():
    print("device:", jax.devices()[0], flush=True)
    k = jax.random.PRNGKey(0)
    key = jax.random.randint(k, (N,), 0, 1 << 30, dtype=jnp.uint32)
    cols = [
        jax.random.randint(jax.random.PRNGKey(i + 1), (N,), 0, 1 << 30, dtype=jnp.uint32)
        for i in range(15)
    ]
    jax.block_until_ready((key, cols))

    # Q2: sort runtime vs payload count (1 key + P payloads)
    for pcount in (1, 3, 7, 11, 15):
        def srt(key, *cs, _p=pcount):
            return jax.lax.sort((key,) + tuple(cs[:_p]), num_keys=1)
        timeit(f"Q2 sort 1key+{pcount}payload @1M", srt, (key, *cols))

    # Q1: five IDENTICAL 8-op sorts in one program (data-dependent chain so
    # none can be CSE'd or DCE'd; the +i makes each input distinct)
    def five_sorts(key, *cs):
        outs = []
        kk = key
        for i in range(5):
            res = jax.lax.sort((kk,) + tuple(c + i for c in cs[:7]), num_keys=1)
            kk = res[1]  # chain
            outs.append(res[-1])
        return outs
    timeit("Q1 five chained 8-op sorts @1M", five_sorts, (key, *cols))

    # Q3: gather vs row width
    idx = jax.random.randint(jax.random.PRNGKey(99), (N,), 0, N, dtype=jnp.int32)
    for w in (4, 16, 36, 64, 128):
        src = jnp.stack(cols[:4] * (w // 4), axis=1) if w <= 60 else jnp.tile(
            jnp.stack(cols[:4], axis=1), (1, w // 4)
        )
        jax.block_until_ready(src)
        t = timeit(
            f"Q3 gather rows [1M,{w}]",
            lambda s, i: jnp.take(s, i, axis=0), (src, idx),
        )
        del src

    # Q4: dispatch floor amortization — 5 dependent sort2 steps in one jit
    def one(key):
        return jax.lax.sort((key, key), num_keys=1)[0]
    def five(key):
        for _ in range(5):
            key = jax.lax.sort((key, key), num_keys=1)[0] + 1
        return key
    t1 = timeit("Q4 sort2 x1 per call", one, (key,))
    t5 = timeit("Q4 sort2 x5 chained in one jit", five, (key,))
    print(f"Q4 floor estimate: {(5*t1 - t5)/4*1e3:.2f} ms/call", flush=True)


if __name__ == "__main__":
    main()
