#!/usr/bin/env python
"""Re-derive the engine's primitive design points with truthful timing.

Uses tools/timing.py chain_time (fori_loop differencing + host fetch) —
see that module's docstring for why every earlier number was tunnel noise.
"""
import sys

import os
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tools"))
import jax
import jax.numpy as jnp

from database_technology_algorithms_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache(tag="tpu")
from timing import chain_time

N = 1 << 20


def report(name, step, k=8, bytes_moved=None):
    per, t1, t2 = chain_time(step, k=k)
    bw = f" {bytes_moved/per/1e9:7.0f} GB/s" if bytes_moved and per > 0 else ""
    print(f"{name:44s} {per*1e3:9.3f} ms/iter  (T{k}={t1*1e3:.0f} T{2*k}={t2*1e3:.0f}){bw}",
          flush=True)
    return per


def main():
    print("device:", jax.devices()[0], flush=True)

    # baseline: the RNG cost everything below shares
    def rng_only(key, c):
        x = jax.random.randint(key, (N,), 0, 1 << 30, dtype=jnp.uint32)
        return x[0] ^ x[-1] ^ c
    rng1 = report("rng u32[1M] (baseline)", rng_only, bytes_moved=N * 4)

    def copy_step(key, c):
        x = jax.random.randint(key, (N, 36), 0, 1 << 30, dtype=jnp.uint32)
        y = x + 1
        return y[0, 0] ^ y[-1, -1] ^ c
    report("rng+copy u32[1M,36] (288MB)", copy_step, bytes_moved=N * 36 * 8)

    def matmul_step(key, c):
        a = jax.random.normal(key, (4096, 4096), dtype=jnp.bfloat16)
        b = a @ a
        return (b[0, 0] != 0).astype(jnp.uint32) ^ c
    report("rng+matmul 4096^3 bf16 (137 GFLOP)", matmul_step)

    def sort1(key, c):
        x = jax.random.randint(key, (N,), 0, 1 << 30, dtype=jnp.uint32)
        y = jax.lax.sort(x)
        return y[0] ^ y[-1] ^ c
    report("rng+sort 1 op u32[1M]", sort1)

    def sort2(key, c):
        x = jax.random.randint(key, (N,), 0, 1 << 30, dtype=jnp.uint32)
        y, i = jax.lax.sort((x, jnp.arange(N, dtype=jnp.int32)), num_keys=1)
        return y[0] ^ jnp.uint32(i[-1]) ^ c
    report("rng+sort (key,iota) u32[1M]", sort2)

    def sort8(key, c):
        x = jax.random.randint(key, (N,), 0, 1 << 30, dtype=jnp.uint32)
        ops = (x,) + tuple(x + j for j in range(7))
        out = jax.lax.sort(ops, num_keys=1)
        return out[0][0] ^ out[-1][-1] ^ c
    report("rng+sort 8 ops u32[1M]", sort8, k=4)

    def take_rows(key, c):
        src = jax.random.randint(key, (N, 36), 0, 1 << 30, dtype=jnp.uint32)
        idx = jax.random.randint(key, (N,), 0, N, dtype=jnp.int32)
        out = jnp.take(src, idx, axis=0)
        return out[0, 0] ^ out[-1, -1] ^ c
    report("rng+take rows u32[1M,36] random", take_rows, k=4,
           bytes_moved=N * 36 * 8)

    def take_1d(key, c):
        src = jax.random.randint(key, (N,), 0, 1 << 30, dtype=jnp.uint32)
        idx = jax.random.randint(key, (N,), 0, N, dtype=jnp.int32)
        out = jnp.take(src, idx)
        return out[0] ^ out[-1] ^ c
    report("rng+take 1-D u32[1M] random", take_1d, bytes_moved=N * 8)

    def take_u8(key, c):
        src = jax.random.randint(key, (N, 128), 0, 255, dtype=jnp.uint8)
        idx = jax.random.randint(key, (N,), 0, N, dtype=jnp.int32)
        out = jnp.take(src, idx, axis=0)
        return (out[0, 0] ^ out[-1, -1]).astype(jnp.uint32) ^ c
    report("rng+take rows u8[1M,128] random", take_u8, k=4,
           bytes_moved=N * 128 * 2)

    def scatter_rows(key, c):
        src = jax.random.randint(key, (N, 36), 0, 1 << 30, dtype=jnp.uint32)
        idx = jax.random.randint(key, (N,), 0, N, dtype=jnp.int32)
        out = jnp.zeros((N, 36), jnp.uint32).at[idx].set(src)
        return out[0, 0] ^ out[-1, -1] ^ c
    report("rng+scatter rows u32[1M,36]", scatter_rows, k=4,
           bytes_moved=N * 36 * 8)

    def hist_step(key, c):
        x = jax.random.randint(key, (N,), 0, 256, dtype=jnp.int32)
        h = jnp.zeros(256, jnp.int32).at[x].add(1)
        return jnp.uint32(h[0] ^ h[-1]) ^ c
    report("rng+histogram-256 .at[].add", hist_step, bytes_moved=N * 4)


if __name__ == "__main__":
    main()
