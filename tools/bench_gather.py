#!/usr/bin/env python
"""Compare XLA gather vs the Pallas pipelined row-gather on the chip."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp

from database_technology_algorithms_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache(tag="tpu")

from database_technology_algorithms_tpu.ops.pallas_gather import pallas_row_gather

N, W = 1 << 20, 36


def timeit(name, fn, *args, reps=3):
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
    print(f"{name:34s} {best*1e3:9.2f} ms (compile {c:.1f}s)", flush=True)
    return out


def main():
    print("device:", jax.devices()[0], flush=True)
    k = jax.random.PRNGKey(0)
    src = jax.random.randint(k, (N + 1, W), 0, 1 << 30, dtype=jnp.uint32)
    idx = jax.random.randint(jax.random.PRNGKey(1), (N,), 0, N, dtype=jnp.int32)
    jax.block_until_ready((src, idx))

    a = timeit("jnp.take rows (N,36)", lambda s, i: jnp.take(s, i, axis=0), src, idx)
    for tile in (512, 2048):
        b = timeit(
            f"pallas_row_gather tile={tile}",
            lambda s, i, t=tile: pallas_row_gather(s, i, tile=t),
            src, idx,
        )
    import numpy as np

    print("match:", bool(jnp.all(a == b)), flush=True)


if __name__ == "__main__":
    main()
