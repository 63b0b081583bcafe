#!/usr/bin/env python
"""Key-sort ceiling study (VERDICT r3 #1): the pipeline's cost is the
2-3-operand key sort itself (~0.9 ms/operand/M rows at 2M); this tool
measures every candidate mechanism for beating `lax.sort` on the
(inactive, key, iota) view sort before/instead of a Pallas kernel:

  A  k-operand flat u32 sort cost curve (k = 1..4) — the baseline model
  B  bit-packed 2-operand form of the 3-operand view sort:
       hi = inact<<31 | key>>1,  lo = (key&1)<<31 | iota
     (exact same total order; sorted key + perm recovered by shifts)
  C  u64 single-operand packed sort (x64 mode, --u64 flag: separate
     process so the global dtype flip cannot contaminate A/B/D)
  D  batched last-axis sorts [G, T], G*T = N: if XLA's TPU sort runs the
     G tiles at full lane parallelism, a partition pass + per-tile sorts
     beats one flat N log N sort (the two-level design's core question)
  E  the partition pass primitives: 255-splitter searchsorted bucketing
     and an 8-bit radix extract

Every measurement CONSUMES A CHECKSUM OF EVERY OUTPUT (XLA's sort
simplifier prunes dead sort operands — PERF_NOTES.md r3 trap) and times
via timed_steady (fenced readback; block_until_ready does not fence on
the axon tunnel).  Run on the real chip; prints one line per variant as
it lands so partial runs still inform.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N = 2 * 1024 * 1024  # the headline pipeline's view-sort size (2x 1M files)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from database_technology_algorithms_tpu.utils.cache import enable_persistent_cache
    from database_technology_algorithms_tpu.utils.profiling import timed_steady

    cpu = "--cpu" in sys.argv
    if cpu:
        jax.config.update("jax_platforms", "cpu")
    enable_persistent_cache(tag="cpu" if cpu else "tpu")
    n = 4096 if cpu else N

    key = jax.random.bits(jax.random.PRNGKey(0), (n,), jnp.uint32)
    inact = (
        jax.random.randint(jax.random.PRNGKey(1), (n,), 0, 100, dtype=jnp.uint32)
        == 0
    ).astype(jnp.uint32)
    iota = jnp.arange(n, dtype=jnp.int32)
    pay = jax.random.randint(jax.random.PRNGKey(2), (n,), 0, 1 << 30, dtype=jnp.uint32)

    def cs(outs):
        t = jnp.uint32(0)
        for o in outs:
            t = t + jnp.sum(o.astype(jnp.uint32))
        return t

    def run(name, fn, *args):
        t, c = timed_steady(fn, args, k=4 if cpu else 6)
        print(f"{name:48s} {t*1e3:9.3f} ms  (compile {c:5.1f}s)", flush=True)
        return t

    if "--u64" in sys.argv:
        jax.config.update("jax_enable_x64", True)
        k64 = (
            inact.astype(jnp.uint64) << 53
            | key.astype(jnp.uint64) << 21
            | iota.astype(jnp.uint64)
        )

        def s_u64(p):
            (o,) = jax.lax.sort((p,), num_keys=1)
            s_key = (o >> 21).astype(jnp.uint32)
            perm = (o & jnp.uint64(0x1FFFFF)).astype(jnp.int32)
            return cs((s_key, perm))

        run("C: 1-op u64 packed(inact,key,iota) + unpack", s_u64, k64)

        def s_u64_pay(p, w):
            o = jax.lax.sort((p, w), num_keys=1)
            return cs(o)

        run("C2: 1-op u64 key + 1 u32 payload", s_u64_pay, k64, pay)
        return

    # ---- A: flat k-operand cost curve -----------------------------------
    def s1(k):
        return cs(jax.lax.sort((k,), num_keys=1))

    def s2(k, i):
        return cs(jax.lax.sort((k, i), num_keys=2))

    def s3(a, k, i):
        return cs(jax.lax.sort((a, k, i), num_keys=3))

    def s4(a, k, i, p):
        return cs(jax.lax.sort((a, k, i, p), num_keys=3))

    run("A1: 1-op u32 sort", s1, key)
    run("A2: 2-op (key, iota)", s2, key, iota)
    t3 = run("A3: 3-op (inact, key, iota)  [view sort]", s3, inact, key, iota)
    run("A4: 3-op + 1 payload", s4, inact, key, iota, pay)

    # ---- B: bit-packed 2-operand view sort ------------------------------
    def sB(a, k, i):
        hi = (a << 31) | (k >> 1)
        lo = ((k & 1) << 31) | i.astype(jnp.uint32)
        o = jax.lax.sort((hi, lo), num_keys=2)
        s_key = (o[0] << 1) | (o[1] >> 31)  # exact for live rows (a=0)
        perm = (o[1] & jnp.uint32(0x7FFFFFFF)).astype(jnp.int32)
        return cs((s_key, perm))

    tB = run("B:  2-op bit-packed view sort + unpack", sB, inact, key, iota)
    print(f"    B/A3 = {tB/t3:.2f}x", flush=True)

    # sanity: B computes the same order as A3
    oa = jax.lax.sort((inact, key, iota), num_keys=3)
    hi = (inact << 31) | (key >> 1)
    lo = ((key & 1) << 31) | iota.astype(jnp.uint32)
    ob = jax.lax.sort((hi, lo), num_keys=2)
    perm_b = np.asarray(ob[1] & jnp.uint32(0x7FFFFFFF)).astype(np.int64)
    assert np.array_equal(np.asarray(oa[2]), perm_b), "B != A3 order"
    print("    B order == A3 order: verified", flush=True)

    # ---- D: batched last-axis sorts -------------------------------------
    for g in (64, 256, 1024, 4096):
        t = n // g
        k2 = key.reshape(g, t)
        i2 = jnp.broadcast_to(
            jnp.arange(t, dtype=jnp.int32)[None, :], (g, t)
        )

        def sD(k2, i2):
            return cs(jax.lax.sort((k2, i2), dimension=1, num_keys=2))

        run(f"D: [{g:5d},{t:6d}] 2-op last-axis sort", sD, k2, i2)

    # ---- E: partition-pass primitives -----------------------------------
    spl = jnp.sort(jax.random.bits(jax.random.PRNGKey(3), (255,), jnp.uint32))

    def e1(k, s):
        return cs((jnp.searchsorted(s, k),))

    run("E1: 255-splitter searchsorted bucket ids", e1, key, spl)

    def e2(k):
        return cs(((k >> 24).astype(jnp.uint8),))

    run("E2: 8-bit radix extract", e2, key)


if __name__ == "__main__":
    main()
