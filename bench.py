#!/usr/bin/env python
"""Benchmark: full reference pipeline (sort→distinct→join→aggregate) on TPU.

Headline metric vs BASELINE.md: the reference MergeJoin pipeline (2x external
sort + dedup + join) processes 1M rows/file in 6.42 s single-core => 155.7k
rows/s.  This runs the same logical pipeline (plus the hash-join cross-check
and a hash aggregate) as one XLA program on one TPU chip, data generated
on-device (reference distribution: num uniform in [0, 30*nblocks)).

Measurement notes (tools/bench_calibrate*.py):
  * block_until_ready does not reliably fence execution through the axon
    tunnel and every synced call carries a fixed ~24 ms round trip, so each
    program runs K iterations inside ONE lax.fori_loop with a data
    dependency between iterations, is fenced by a device->host scalar
    readback, and reports (t_K - t_base)/K;
  * the headline program RETURNS THE JOIN OUTPUT COLUMNS and folds them
    into the loop carry, so the record materialization cannot be dead-code
    eliminated (round-1 weakness: counters-only bench);
  * a counters-only variant is reported alongside for comparison.

Prints per-op roofline lines (fraction of HBM speed-of-light, the north
star's >=80% target) on stderr and ONE JSON line on stdout:
  {"metric": ..., "value": rows/s, "unit": "rows/s", "vs_baseline": x, ...}
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

ROWS = 1_000_000
KEY_RANGE = 300_000
K = 4  # loop iterations per timed program
BASELINE_ROWS_PER_S = 155_700.0  # BASELINE.md MergeJoin pipeline, 1 x86 core


def fence(out) -> float:
    """Force full execution: device->host readback of one scalar."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.asarray(leaf).reshape(-1)[0])


def timed(fn, args, reps=3):
    f = jax.jit(fn)
    t0 = time.perf_counter()
    out = f(*args)
    fence(out)
    compile_s = time.perf_counter() - t0
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(*args)
        fence(out)
        best = min(best, time.perf_counter() - t0)
    return best, compile_s


def main() -> int:
    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    from database_technology_algorithms_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache(tag="cpu" if "--cpu" in sys.argv else "tpu")
    from database_technology_algorithms_tpu.io.device_gen import generate_device_batch
    from database_technology_algorithms_tpu.models.pipeline import pipeline_single_impl
    from database_technology_algorithms_tpu.ops.distinct import distinct_impl
    from database_technology_algorithms_tpu.ops.hash_join import hash_join_count_impl
    from database_technology_algorithms_tpu.ops.sort import sort_batch_impl
    from database_technology_algorithms_tpu.utils.roofline import audit

    dev = jax.devices()[0]
    k1, k2 = jax.random.split(jax.random.PRNGKey(42))
    t0 = time.perf_counter()
    r = generate_device_batch(k1, ROWS, key_range=KEY_RANGE)
    s = generate_device_batch(k2, ROWS, key_range=KEY_RANGE)
    jax.block_until_ready((r, s))
    gen_s = time.perf_counter() - t0

    # baseline: fixed per-call overhead (tunnel round trip + dispatch)
    def base_loop(x):
        return jax.lax.fori_loop(0, K, lambda i, a: a + 1, x)

    t_base, _ = timed(base_loop, (jnp.uint32(0),))

    results = []  # (name, per_iter_s, compile_s, audit_op, rows)

    def run(name, loop_fn, args, audit_op, rows):
        t, c = timed(loop_fn, args)
        per = max((t - t_base) / K, 1e-9)
        results.append((name, per, c, audit_op, rows))
        return per

    # ---- headline: full pipeline, join output MATERIALIZED + consumed ----
    def pipe_mat_loop(r, s):
        def body(i, carry):
            rr, acc = carry
            out = pipeline_single_impl(rr, s, field=1)
            j = out["join_out"]
            # fold the materialized output into the carry: every column of
            # join_out feeds the accumulator, so nothing can be DCE'd; the
            # next iteration's input depends on the accumulator (ordering)
            acc = (
                acc
                + jnp.sum(j.recid, dtype=jnp.uint32)
                + jnp.sum(j.num, dtype=jnp.uint32)
                + jnp.sum(j.strw, dtype=jnp.uint32)
                + out["merge_nres"].astype(jnp.uint32)
                + out["hash_nres"].astype(jnp.uint32)
            )
            rr = type(rr)(
                recid=rr.recid + jnp.uint32(1),  # new data each iter: no LICM/CSE
                num=rr.num,
                strw=rr.strw,
                valid=rr.valid,
            )
            return rr, acc
        _, acc = jax.lax.fori_loop(0, K, body, (r, jnp.uint32(0)))
        out = pipeline_single_impl(r, s, field=1)
        return acc, out["merge_nres"], out["hash_nres"]

    per_mat = run("pipeline_materialized", pipe_mat_loop, (r, s), "pipeline", ROWS)
    # correctness cross-check (the reference driver's own oracle)
    chk = jax.jit(lambda r, s: pipeline_single_impl(r, s, field=1))(r, s)
    merge_nres, hash_nres = int(chk["merge_nres"]), int(chk["hash_nres"])

    # ---- counters-only variant ------------------------------------------
    def pipe_cnt_loop(r, s):
        def body(i, carry):
            rr, acc = carry
            out = pipeline_single_impl(rr, s, field=1)
            acc = acc + out["merge_nres"].astype(jnp.uint32) + out[
                "hash_nres"
            ].astype(jnp.uint32)
            rr = type(rr)(
                recid=rr.recid + jnp.uint32(1), num=rr.num, strw=rr.strw, valid=rr.valid
            )
            return rr, acc
        return jax.lax.fori_loop(0, K, body, (r, jnp.uint32(0)))[1]

    run("pipeline_counters_only", pipe_cnt_loop, (r, s), "pipeline", ROWS)

    # ---- per-op audits ----------------------------------------------------
    def sort_loop(r):
        def body(i, carry):
            rr, acc = carry
            out, _ = sort_batch_impl(rr, 1)
            acc = acc + jnp.sum(out.num, dtype=jnp.uint32)
            rr = type(rr)(
                recid=rr.recid + jnp.uint32(1), num=rr.num, strw=rr.strw, valid=rr.valid
            )
            return rr, acc
        return jax.lax.fori_loop(0, K, body, (r, jnp.uint32(0)))[1]

    run("sort", sort_loop, (r,), "sort", ROWS)

    def distinct_loop(r):
        def body(i, carry):
            rr, acc = carry
            out, n = distinct_impl(rr, 1)
            acc = acc + jnp.sum(out.num, dtype=jnp.uint32) + n.astype(jnp.uint32)
            rr = type(rr)(
                recid=rr.recid + jnp.uint32(1), num=rr.num, strw=rr.strw, valid=rr.valid
            )
            return rr, acc
        return jax.lax.fori_loop(0, K, body, (r, jnp.uint32(0)))[1]

    run("distinct", distinct_loop, (r,), "distinct", ROWS)

    def hj_loop(r, s):
        def body(i, carry):
            rr, acc = carry
            matched, mult, nres = hash_join_count_impl(rr, s, 1)
            acc = acc + nres.astype(jnp.uint32)
            rr = type(rr)(
                recid=rr.recid + jnp.uint32(1), num=rr.num, strw=rr.strw, valid=rr.valid
            )
            return rr, acc
        return jax.lax.fori_loop(0, K, body, (r, jnp.uint32(0)))[1]

    run("hash_join_count", hj_loop, (r, s), "hash_join", ROWS)

    # ---- report -----------------------------------------------------------
    print(
        f"# device={dev.platform} gen={gen_s:.2f}s base_loop={t_base*1e3:.1f}ms "
        f"merge_nres={merge_nres} hash_nres={hash_nres} "
        f"agree={merge_nres == hash_nres}",
        file=sys.stderr,
    )
    detail = {}
    for name, per, c, op, rows in results:
        a = audit(op, rows, per, device=dev)
        detail[name] = {
            "ms": round(per * 1e3, 3),
            "compile_s": round(c, 1),
            "fraction_of_sol": round(a.fraction_of_sol, 4),
            "rows_per_s": round(rows / per, 1),
        }
        print(
            f"# roofline {name:24s} {per*1e3:9.2f} ms  "
            f"{100*a.fraction_of_sol:5.1f}% of {a.sol_gbps:.0f} GB/s SoL  "
            f"({rows/per/1e6:.2f} M rows/s)  compile={c:.0f}s",
            file=sys.stderr,
        )

    rows_per_s = ROWS / results[0][1]  # headline = MATERIALIZED pipeline
    print(
        json.dumps(
            {
                "metric": "mergejoin_pipeline_rows_per_s_1chip",
                "value": round(rows_per_s, 1),
                "unit": "rows/s",
                "vs_baseline": round(rows_per_s / BASELINE_ROWS_PER_S, 2),
                "materialized": True,
                "detail": detail,
            }
        )
    )
    return 0 if merge_nres == hash_nres else 1


if __name__ == "__main__":
    raise SystemExit(main())
