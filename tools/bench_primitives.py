#!/usr/bin/env python
"""Re-derive the engine's primitive design points with truthful timing.

Protocol: ``utils/profiling.timed_steady`` — the repo's ONE timing
protocol (K queued dispatches fenced by a device->host scalar readback;
independent minima of the K-run and 1-run direct measurements).  The
legacy fori-loop differencing protocol (tools/timing.py) is retained only
as a historical record; loop-wrapping sort programs compiles
pathologically (profiling.py docstring), so nothing current uses it.

Every step consumes a checksum over EVERY output column (XLA's sort
simplifier prunes dead sort operands — PERF_NOTES.md methodology).
"""
import sys

import os
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
import jax
import jax.numpy as jnp

from database_technology_algorithms_tpu.utils.cache import enable_persistent_cache
from database_technology_algorithms_tpu.utils.profiling import timed_steady

enable_persistent_cache(tag="tpu")

N = 1 << 20


def report(name, fn, args, k=8, bytes_moved=None):
    per, compile_s = timed_steady(fn, args, k=k)
    bw = f" {bytes_moved/per/1e9:7.0f} GB/s" if bytes_moved and per > 0 else ""
    print(
        f"{name:44s} {per*1e3:9.3f} ms/iter  (compile {compile_s:.1f}s){bw}",
        flush=True,
    )
    return per


def main():
    print("device:", jax.devices()[0], flush=True)
    key = jax.random.PRNGKey(0)
    x1 = jax.random.randint(key, (N,), 0, 1 << 30, dtype=jnp.uint32)
    x36 = jax.random.randint(key, (N, 36), 0, 1 << 30, dtype=jnp.uint32)
    idx = jax.random.randint(key, (N,), 0, N, dtype=jnp.int32)
    a = jax.random.normal(key, (4096, 4096), dtype=jnp.bfloat16)
    jax.block_until_ready((x1, x36, idx, a))

    report(
        "copy u32[1M,36] (288MB)",
        lambda x: (x + 1).sum(dtype=jnp.uint32), (x36,),
        bytes_moved=N * 36 * 8,
    )
    report(
        "matmul 4096^3 bf16 (137 GFLOP)",
        lambda m: (m @ m).astype(jnp.float32).sum(), (a,),
    )
    report(
        "sort 1 op u32[1M]",
        lambda x: jax.lax.sort(x).sum(dtype=jnp.uint32), (x1,),
    )
    report(
        "sort (key,iota) u32[1M]",
        lambda x: sum(
            o.astype(jnp.uint32).sum()
            for o in jax.lax.sort(
                (x, jnp.arange(N, dtype=jnp.int32)), num_keys=1
            )
        ),
        (x1,),
    )
    report(
        "sort 8 ops u32[1M]",
        lambda x: sum(
            o.sum(dtype=jnp.uint32)
            for o in jax.lax.sort(
                (x,) + tuple(x + j for j in range(7)), num_keys=1
            )
        ),
        (x1,), k=4,
    )
    report(
        "take rows u32[1M,36] random",
        lambda s, i: jnp.take(s, i, axis=0).sum(dtype=jnp.uint32),
        (x36, idx), k=4, bytes_moved=N * 36 * 8,
    )
    report(
        "take 1-D u32[1M] random",
        lambda s, i: jnp.take(s, i).sum(dtype=jnp.uint32),
        (x1, idx), bytes_moved=N * 8,
    )
    report(
        "scatter rows u32[1M,36]",
        lambda s, i: jnp.zeros((N, 36), jnp.uint32).at[i].set(s).sum(
            dtype=jnp.uint32
        ),
        (x36, idx), k=4, bytes_moved=N * 36 * 8,
    )
    report(
        "histogram-256 .at[].add",
        lambda i: jnp.zeros(256, jnp.int32).at[i % 256].add(1).sum(
            dtype=jnp.int32
        ),
        (idx,), bytes_moved=N * 4,
    )


if __name__ == "__main__":
    main()
