#!/usr/bin/env python
"""Benchmark: full reference pipeline (sort→distinct→join→aggregate) on TPU.

Headline metric vs BASELINE.md: the reference MergeJoin pipeline (2x external
sort + dedup + join) processes 1M rows/file in 6.42 s single-core => 155.7k
rows/s.  This runs the same logical pipeline (plus the hash-join cross-check
and a hash aggregate) as one XLA program on one TPU chip, data generated
on-device (reference distribution: num uniform in [0, 30*nblocks)).

Measurement notes (tools/bench_calibrate*.py, PERF_NOTES.md):
  * block_until_ready does not reliably fence execution through the axon
    tunnel, and every synced call carries a fixed ~26 ms round trip — each
    timing therefore ends with a device->host scalar readback (which does
    fence) and reports the K-dispatch steady state:
    (time of K queued dispatches + fence  -  time of 1 dispatch + fence)
    / (K - 1), which cancels the round trip without wrapping the program
    in lax.fori_loop (loop-wrapped sort programs compile pathologically);
  * the headline program RETURNS the materialized join output, whose sum
    feeds the fenced scalar, so the record materialization cannot be
    dead-code eliminated (round-1 weakness: counters-only bench);
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
K = 6  # queued dispatches per steady-state timing
BASELINE_ROWS_PER_S = 155_700.0  # BASELINE.md MergeJoin pipeline, 1 x86 core


def fence(out) -> float:
    """Force full execution: device->host readback of one scalar."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.asarray(leaf).reshape(-1)[0])


def timed_steady(fn, args, reps=2):
    """(per_iter_s, compile_s): K-dispatch steady state minus 1-dispatch."""
    f = jax.jit(fn)
    t0 = time.perf_counter()
    fence(f(*args))
    compile_s = time.perf_counter() - t0
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        fence(f(*args))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = None
        for _ in range(K):
            out = f(*args)
        fence(out)
        tk = time.perf_counter() - t0
        best = min(best, max((tk - t1) / (K - 1), 1e-9))
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

    results = []  # (name, per_iter_s, compile_s, audit_op, rows)

    def run(name, fn, args, audit_op, rows):
        per, c = timed_steady(fn, args)
        results.append((name, per, c, audit_op, rows))
        return per

    # ---- headline: full pipeline, join output MATERIALIZED + consumed ----
    def pipe_mat(r, s):
        out = pipeline_single_impl(r, s, field=1)
        j = out["join_out"]
        # scalar fed to the fence depends on every join_out column: the
        # materialization cannot be elided
        chk = (
            jnp.sum(j.recid, dtype=jnp.uint32)
            + jnp.sum(j.num, dtype=jnp.uint32)
            + jnp.sum(j.strw, dtype=jnp.uint32)
        )
        return chk, out["merge_nres"], out["hash_nres"], out["nunique_r"]

    per_mat = run("pipeline_materialized", pipe_mat, (r, s), "pipeline", ROWS)
    out = jax.jit(pipe_mat)(r, s)
    merge_nres, hash_nres = int(out[1]), int(out[2])

    # ---- counters-only variant (join materialization DCE'd on purpose) ---
    def pipe_cnt(r, s):
        out = pipeline_single_impl(r, s, field=1)
        return out["merge_nres"], out["hash_nres"], out["nunique_r"]

    run("pipeline_counters_only", pipe_cnt, (r, s), "pipeline", ROWS)

    # ---- per-op audits ----------------------------------------------------
    def sort_fn(r):
        out, _ = sort_batch_impl(r, 1)
        return jnp.sum(out.num, dtype=jnp.uint32), jnp.sum(out.strw, dtype=jnp.uint32)

    run("sort", sort_fn, (r,), "sort", ROWS)

    def distinct_fn(r):
        out, n = distinct_impl(r, 1)
        return jnp.sum(out.num, dtype=jnp.uint32) + n.astype(jnp.uint32)

    run("distinct", distinct_fn, (r,), "distinct", ROWS)

    def hj_fn(r, s):
        matched, mult, nres = hash_join_count_impl(r, s, 1)
        return nres

    run("hash_join_count", hj_fn, (r, s), "hash_join", ROWS)

    # ---- report -----------------------------------------------------------
    print(
        f"# device={dev.platform} gen={gen_s:.2f}s K={K} "
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
