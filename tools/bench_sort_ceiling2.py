#!/usr/bin/env python
"""Key-sort ceiling study, part 2: stabilized + the two-level candidates.

Part 1 (bench_sort_ceiling.py) showed high variance on flat sorts
(A3 measured below A2) and a dramatic batched-last-axis advantage
([64, 32768] 2-op in 0.73 ms vs 3.3 ms flat).  This part:

  R   re-measures flat 2/3-op and the packed-B form at higher rep counts
      (interleaved, best-of — the tunnel's noise floor demands it)
  T   transpose cost [G,T] -> [T,G] (u32, 2M) — the columnsort building
      block
  M   batched merge-tree feasibility: batched sort cost vs tile length
      at fixed element count ([2,1M] ... [1024,2048]); if cost rises to
      the flat level as T grows, a merge tree has no win at the root
  S   fast bucketing: 255-way broadcast-compare (sum of key >= splitter)
      vs the 137 ms jnp.searchsorted scan — the partition-pass primitive
  P   the actual headline components at 2M: stage_a's view sort + scans
      shape, and a 6-operand placement-group sort (what the pipeline
      actually pays today)

Checksums consume every output (dead-operand pruning); timed_steady
fenced readbacks throughout.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N = 2 * 1024 * 1024


def main() -> None:
    import jax
    import jax.numpy as jnp

    from database_technology_algorithms_tpu.utils.cache import enable_persistent_cache
    from database_technology_algorithms_tpu.utils.profiling import timed_steady

    cpu = "--cpu" in sys.argv
    if cpu:
        jax.config.update("jax_platforms", "cpu")
    enable_persistent_cache(tag="cpu" if cpu else "tpu")
    n = 8192 if cpu else N

    key = jax.random.bits(jax.random.PRNGKey(0), (n,), jnp.uint32)
    # the reference workload's actual distribution: uniform in [0, 0.3n)
    key_ref = jax.random.randint(
        jax.random.PRNGKey(4), (n,), 0, max(3 * n // 10, 1), dtype=jnp.uint32
    )
    inact = (
        jax.random.randint(jax.random.PRNGKey(1), (n,), 0, 100, dtype=jnp.uint32)
        == 0
    ).astype(jnp.uint32)
    iota = jnp.arange(n, dtype=jnp.int32)
    pays = [
        jax.random.bits(jax.random.PRNGKey(10 + j), (n,), jnp.uint32)
        for j in range(5)
    ]

    def cs(outs):
        t = jnp.uint32(0)
        for o in outs:
            t = t + jnp.sum(o.astype(jnp.uint32))
        return t

    results = {}

    def run(name, fn, *args, reps=4):
        t, c = timed_steady(fn, args, k=4 if cpu else 8, reps=reps)
        results[name] = t
        print(f"{name:52s} {t*1e3:9.3f} ms  (compile {c:5.1f}s)", flush=True)
        return t

    # ---- R: stabilized flat baselines -----------------------------------
    def s2(k, i):
        return cs(jax.lax.sort((k, i), num_keys=2))

    def s3(a, k, i):
        return cs(jax.lax.sort((a, k, i), num_keys=3))

    run("R2: 2-op (key, iota) flat", s2, key, iota)
    run("R3: 3-op (inact, key, iota) flat", s3, inact, key, iota)
    run("R3ref: 3-op, reference key dist", s3, inact, key_ref, iota)

    def sB(a, k, i):
        hi = (a << 31) | (k >> 1)
        lo = ((k & 1) << 31) | i.astype(jnp.uint32)
        o = jax.lax.sort((hi, lo), num_keys=2)
        s_key = (o[0] << 1) | (o[1] >> 31)
        perm = (o[1] & jnp.uint32(0x7FFFFFFF)).astype(jnp.int32)
        return cs((s_key, perm))

    run("RB: 2-op bit-packed + unpack", sB, inact, key, iota)

    # ---- T: transpose ----------------------------------------------------
    g = 64
    k2 = key.reshape(g, n // g)

    def tr(k2):
        return cs((k2.T,))

    run("T:  [64, 32768] u32 transpose", tr, k2)

    # ---- M: batched sort cost vs tile length (fixed 2M elements) ---------
    for g in (2, 8, 32, 64, 256, 1024):
        t = n // g
        k2 = key.reshape(g, t)
        i2 = jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32)[None, :], (g, t))

        def sD(k2, i2):
            return cs(jax.lax.sort((k2, i2), dimension=1, num_keys=2))

        run(f"M: [{g:5d},{t:7d}] 2-op batched sort", sD, k2, i2)

    # ---- S: fast bucketing ----------------------------------------------
    spl = jnp.sort(jax.random.bits(jax.random.PRNGKey(3), (255,), jnp.uint32))

    def bc(k, s):
        b = jnp.sum(
            (k[:, None] >= s[None, :]).astype(jnp.int32), axis=1
        )
        return cs((b,))

    run("S1: 255-splitter broadcast-compare buckets", bc, key, spl)

    def bc_blocked(k, s):
        # [G, T, 255] blocked to help fusion
        kb = k.reshape(-1, 2048)
        b = jnp.sum((kb[:, :, None] >= s[None, None, :]).astype(jnp.int32), axis=2)
        return cs((b.reshape(-1),))

    run("S2: same, 2048-row blocks", bc_blocked, key, spl)

    # ---- P: what the pipeline pays today --------------------------------
    def place6(d, *ws):
        return cs(jax.lax.sort((d,) + ws, num_keys=1))

    dest = jax.random.bits(jax.random.PRNGKey(20), (n,), jnp.uint32)
    run("P6: 6-operand placement sort (1 key + 5 pay)", place6, dest, *pays)

    def stage_a_sort(a, k, i):
        out = jax.lax.sort((a, k, i), num_keys=3)
        s_inact, s_key, perm = out
        adj = jnp.concatenate(
            [jnp.zeros(1, bool), s_key[1:] == s_key[:-1]]
        )
        return cs((s_key, perm, adj.astype(jnp.uint32)))

    run("PA: view sort + adjacency (stage_a core)", stage_a_sort, inact, key_ref, iota)

    print("\nsummary (ms): " + ", ".join(
        f"{k.split(':')[0]}={v*1e3:.2f}" for k, v in results.items()
    ), flush=True)


if __name__ == "__main__":
    main()
