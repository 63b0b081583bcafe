#!/usr/bin/env python
"""Timing-fidelity calibration for the target TPU through the axon tunnel.

Round-1 and round-2 microbenchmarks disagree wildly on gather cost (32 ms vs
0.06 ms per 1M rows).  0.06 ms for a 288 MB-traffic op is 4.8 TB/s — above
the chip's 819 GB/s HBM — so either the runtime improved or
block_until_ready doesn't actually fence execution on this platform.  This
bench decides it three ways:

  1. a known-traffic baseline (elementwise copy) to measure achievable GB/s;
  2. every op timed BOTH with block_until_ready and with a forced
     device→host scalar readback (float(out.sum()) cannot complete before
     the op does);
  3. a size sweep (N and 8N): real execution must scale ~linearly.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp

from database_technology_algorithms_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache(tag="tpu")

W = 36


def bench(name, fn, args, traffic_bytes, reps=5):
    f = jax.jit(fn)
    t0 = time.perf_counter()
    out = f(*args)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    # block_until_ready timing
    best_b = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*args))
        best_b = min(best_b, time.perf_counter() - t0)
    # host-readback timing (sum to scalar inside jit would change traffic;
    # instead fetch ONE element of the result to host — forces completion)
    best_h = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        o = f(*args)
        leaf = jax.tree_util.tree_leaves(o)[0]
        _ = float(leaf.reshape(-1)[0])
        best_h = min(best_h, time.perf_counter() - t0)
    gbps_b = traffic_bytes / best_b / 1e9
    gbps_h = traffic_bytes / best_h / 1e9
    print(
        f"{name:34s} block={best_b*1e3:8.3f} ms ({gbps_b:7.1f} GB/s)  "
        f"host={best_h*1e3:8.3f} ms ({gbps_h:7.1f} GB/s)  compile={compile_s:.1f}s",
        flush=True,
    )


def suite(n):
    print(f"--- N = {n} ---", flush=True)
    k = jax.random.PRNGKey(0)
    src = jax.random.randint(k, (n, W), 0, 1 << 30, dtype=jnp.uint32)
    idx = jax.random.randint(jax.random.PRNGKey(1), (n,), 0, n, dtype=jnp.int32)
    col = src[:, 0]
    iota = jnp.arange(n, dtype=jnp.int32)
    jax.block_until_ready((src, idx, col, iota))
    row_bytes = 4 * W

    bench("copy 2D (x+1)", lambda s: s + 1, (src,), 2 * n * row_bytes)
    bench("gather rows random", lambda s, i: jnp.take(s, i, axis=0), (src, idx),
          2 * n * row_bytes)
    bench("gather rows fill-mode",
          lambda s, i: jnp.take(s, i, axis=0, mode="fill", fill_value=0),
          (src, idx), 2 * n * row_bytes)
    bench("gather 1 column random", lambda c, i: jnp.take(c, i), (col, idx),
          2 * n * 4)
    bench("sort 2op (key,iota)", lambda c, t: jax.lax.sort((c, t), num_keys=1),
          (col, iota), 4 * n * 4)
    bench(
        "sort 8op (key + 7 payload)",
        lambda s, c: jax.lax.sort((c,) + tuple(s[:, j] for j in range(7)), num_keys=1),
        (src, col),
        2 * n * 4 * 8,
    )


if __name__ == "__main__":
    print("device:", jax.devices()[0], flush=True)
    suite(1 << 17)
    suite(1 << 20)
