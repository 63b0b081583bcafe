#!/usr/bin/env python
"""Trustworthy per-op device timings through the axon tunnel.

(Supersedes the retired bench_calibrate.py / bench_calibrate2.py — their
findings live in PERF_NOTES.md: the copy-baseline GB/s anchor, the
block_until_ready-doesn't-fence diagnosis, the compile-scaling and
gather-width sweeps, and the retired pallas_gather per-row-DMA experiment's
negative result.)

Methodology (the tunnel makes naive timing lie):
  * block_until_ready does NOT reliably fence execution on this platform
    (calibrate2 measured a [1M,128] gather at 15 TB/s) — every timing here
    ends with a device->host scalar readback, which cannot complete early;
  * a fixed ~24 ms round-trip rides on every synced call — each op runs
    K=8 times inside ONE jitted lax.fori_loop (single compile of the body)
    and the per-iteration cost is (t_K - t_0)/K against an empty-loop
    baseline measured the same way;
  * loop carries data dependencies so iterations cannot fuse or reorder.
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
K = 8
W = 35  # RecordBatch payload words


def timed(name, fn, args, reps=3):
    f = jax.jit(fn)
    t0 = time.perf_counter()
    out = f(*args)
    _ = float(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])
    compile_s = time.perf_counter() - t0
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(*args)
        _ = float(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])
        best = min(best, time.perf_counter() - t0)
    return best, compile_s


def loop(body):
    def fn(*args):
        return jax.lax.fori_loop(0, K, body, args)
    return fn


def report(name, t, base, compile_s, bytes_per_iter=None):
    per = (t - base) / K * 1e3
    bw = f"  {bytes_per_iter/ (per/1e3) / 1e9:7.1f} GB/s" if bytes_per_iter and per > 0 else ""
    print(f"{name:40s} {per:8.3f} ms/iter{bw}  (compile {compile_s:.0f}s)", flush=True)
    return per


def main():
    print(f"device: {jax.devices()[0]}  K={K}  N={N}", flush=True)
    k0 = jax.random.PRNGKey(0)
    key = jax.random.randint(k0, (N,), 0, 1 << 30, dtype=jnp.uint32)
    cols = tuple(
        jax.random.randint(jax.random.PRNGKey(i + 1), (N,), 0, 1 << 30, dtype=jnp.uint32)
        for i in range(11)
    )
    mat = jax.random.randint(jax.random.PRNGKey(77), (N, 36), 0, 1 << 30, dtype=jnp.uint32)
    idx = jax.random.randint(jax.random.PRNGKey(88), (N,), 0, N, dtype=jnp.int32)
    jax.block_until_ready((key, cols, mat, idx))

    # baseline: empty-ish loop (one cheap dependent add)
    t0, c0 = timed("base", loop(lambda i, a: (a[0] + 1,) + a[1:]), (key,))
    print(f"{'baseline loop(add)':40s} total {t0*1e3:8.2f} ms (compile {c0:.0f}s)", flush=True)

    def dep(x):  # cheap data dependency: keep domain, force ordering
        return x ^ 1

    # copy: elementwise on [N,36]
    t, c = timed("copy", loop(lambda i, a: (dep(a[0]),)), (mat,))
    report("copy [1M,36] (read+write 288MB)", t, t0, c, 2 * N * 36 * 4)

    # sorts with P payloads
    for p in (1, 3, 7, 11):
        def body(i, a, _p=p):
            res = jax.lax.sort((dep(a[0]),) + a[1 : 1 + _p], num_keys=1)
            return (res[0],) + res[1:] + a[1 + _p:]
        t, c = timed(f"sort{p}", loop(body), (key,) + cols)
        report(f"sort 1key+{p}payload", t, t0, c, 2 * N * 4 * (1 + p))

    # row gather [1M,36]
    def gbody(i, a):
        m, ix = a
        m2 = jnp.take(m, ix, axis=0)
        return m2, dep(ix) % N
    t, c = timed("gather36", loop(gbody), (mat, idx))
    report("row gather [1M,36]", t, t0, c, 2 * N * 36 * 4)

    # single-column gather
    def g1body(i, a):
        col, ix = a
        out = jnp.take(col, ix)
        return out, (ix + 1) % N
    t, c = timed("gather1", loop(g1body), (cols[0], idx))
    report("col gather [1M]", t, t0, c, 2 * N * 4)

    # full 35-word placement (permute_rows core): 5 chained 8-op sorts
    def pbody(i, a):
        dest = dep(a[0])
        words = a[1:]
        outs = []
        for base in range(0, W - 1, 7):
            chunk = words[base : base + 7]
            res = jax.lax.sort((dest,) + chunk, num_keys=1)
            outs.extend(res[1:])
        # reuse original width: pad with first outputs
        outs = tuple(outs)[: len(words)]
        return (dest,) + outs + words[len(outs):]
    wide = cols * 4  # 44 words; use first 34
    t, c = timed("placement", loop(pbody), (key,) + wide[:34])
    report("placement 34 words (5x 8-op sorts)", t, t0, c, 2 * N * 4 * 35)

    # searchsorted probe (1M probes into 1M sorted)
    skey = jnp.sort(key)
    def sbody(i, a):
        q, acc = a
        pos = jnp.searchsorted(skey, q)
        return dep(q), acc + pos
    t, c = timed("searchsorted", loop(sbody), (key, jnp.zeros(N, jnp.int32)))
    report("searchsorted 1M into 1M", t, t0, c, None)


if __name__ == "__main__":
    main()
