#!/usr/bin/env python
"""Timing sanity: known-cost ops to calibrate the harness against HBM BW.

v5e: ~819 GB/s HBM, 197 bf16 TFLOP/s.  If measured numbers beat these,
the timing harness (not the chip) is lying.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp

from database_technology_algorithms_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache(tag="tpu")

N, W = 1 << 20, 36


def timeit(name, fn, *args, reps=5, bytes_moved=None):
    f = jax.jit(fn)
    t0 = time.perf_counter()
    out = f(*args)
    jax.block_until_ready(out)
    c = time.perf_counter() - t0
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    bw = f"  {bytes_moved/best/1e9:8.0f} GB/s" if bytes_moved else ""
    print(f"{name:40s} {best*1e3:9.3f} ms (compile {c:.1f}s){bw}", flush=True)
    return out


def main():
    print("device:", jax.devices()[0], flush=True)
    k = jax.random.PRNGKey(0)
    src = jax.random.randint(k, (N, W), 0, 1 << 30, dtype=jnp.uint32)
    idx = jax.random.randint(jax.random.PRNGKey(1), (N,), 0, N, dtype=jnp.int32)
    strs = jax.random.randint(jax.random.PRNGKey(3), (N, 128), 0, 255, dtype=jnp.uint8)
    jax.block_until_ready((src, idx, strs))

    nb = N * W * 4 * 2
    timeit("copy src+1 (288MB moved)", lambda s: s + 1, src, bytes_moved=nb)
    timeit("A jnp.take rows random", lambda s, i: jnp.take(s, i, axis=0), src, idx,
           bytes_moved=nb)
    timeit("u8 (N,128) take random", lambda s, i: jnp.take(s, i, axis=0), strs, idx,
           bytes_moved=N * 128 * 2)
    timeit("u8->u32 view take",
           lambda s, i: jnp.take(jax.lax.bitcast_convert_type(s.reshape(N, 32, 4), jnp.uint32), i, axis=0),
           strs, idx, bytes_moved=N * 128 * 2)
    a = jax.random.normal(jax.random.PRNGKey(4), (4096, 4096), dtype=jnp.bfloat16)
    timeit("matmul 4096^3 bf16 (137 GFLOP)", lambda x: x @ x, a)


if __name__ == "__main__":
    main()
