#!/usr/bin/env python
"""Per-operator on-chip timings: where does the pipeline's 0.34s go?

Times each primitive at 1M rows (reference benchmark scale) plus micro
building blocks (raw key sort, full-record gather, compaction scatter) to
locate the distance from HBM speed-of-light.  Uses the persistent compile
cache so reruns skip the tunnel compile.
"""

import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/build/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, "/root/repo")

from database_technology_algorithms_tpu.io.device_gen import generate_device_batch
from database_technology_algorithms_tpu.ops.distinct import distinct
from database_technology_algorithms_tpu.ops.hash_join import hash_join_count
from database_technology_algorithms_tpu.ops.merge_join import join_sorted_distinct
from database_technology_algorithms_tpu.ops.sort import sort_batch
from database_technology_algorithms_tpu.ops.aggregate import group_aggregate
from database_technology_algorithms_tpu.ops.filter import compact

N = 1_000_000
KEY_RANGE = 300_000


def timeit(name, fn, *args, reps=3):
    fn2 = jax.jit(fn) if not hasattr(fn, "lower") else fn
    t0 = time.perf_counter()
    out = fn2(*args)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn2(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    print(f"{name:40s} {best*1e3:9.2f} ms   (compile {compile_s:.1f}s)", flush=True)
    return out


def main():
    print("device:", jax.devices()[0], flush=True)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    r = generate_device_batch(k1, N, key_range=KEY_RANGE)
    s = generate_device_batch(k2, N, key_range=KEY_RANGE)
    jax.block_until_ready((r, s))

    # micro building blocks
    timeit("lax.sort u32 keys only", lambda x: jax.lax.sort(x), r.num)
    timeit(
        "lax.sort (key, iota) pair",
        lambda x: jax.lax.sort((x, jnp.arange(N, dtype=jnp.int32)), num_keys=2),
        r.num,
    )
    perm = jnp.flip(jnp.arange(N, dtype=jnp.int32))
    timeit("gather u32 col by perm", lambda p: jnp.take(r.num, p, axis=0), perm)
    timeit("gather strs (128B) by perm", lambda p: jnp.take(r.strs, p, axis=0), perm)
    timeit("full batch take(perm)", lambda p: r.take(p), perm)
    mask = r.num < KEY_RANGE // 2
    timeit("compact (mask scatter)", lambda m: compact(r, m), mask)
    timeit("argsort u32 (jnp)", lambda x: jnp.argsort(x), r.num)

    # operator level
    timeit("sort_batch field1", lambda a: sort_batch(a, 1), r)
    timeit("distinct field1", lambda a: distinct(a, 1), r)
    rd, nr = distinct(r, 1)
    sd, ns = distinct(s, 1)
    jax.block_until_ready((rd, sd))
    timeit(
        "join_sorted_distinct",
        lambda a, b, na, nb: join_sorted_distinct(a, na, b, nb, 1),
        rd, sd, nr, ns,
    )
    timeit("hash_join_count raw", lambda a, b: hash_join_count(a, b, 1), r, s)
    timeit("group_aggregate field1", lambda a: group_aggregate(a, 1), s)
    # string sort at 1M for reference
    timeit("sort_batch field2 (str)", lambda a: sort_batch(a, 2), r)


if __name__ == "__main__":
    main()
