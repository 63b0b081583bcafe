#!/usr/bin/env python
"""Benchmark: full reference pipeline (sort→distinct→join→aggregate) on TPU.

Headline metric vs BASELINE.md: the reference MergeJoin pipeline (2x external
sort + dedup + join) processes 1M rows/file in 6.42 s single-core => 155.7k
rows/s.  This runs the same logical pipeline (plus the hash-join cross-check
and a hash aggregate) on one TPU chip, data generated on-device (reference
distribution: num uniform in [0, 30*nblocks)).

Measurement notes (tools/bench_calibrate*.py, PERF_NOTES.md):
  * block_until_ready does not reliably fence execution through the axon
    tunnel, and every synced call carries a fixed ~26 ms round trip — each
    timing therefore ends with a device->host scalar readback (which does
    fence) and reports the K-dispatch steady state:
    (K queued dispatch rounds + fence  -  1 round + fence) / (K - 1);
  * the pipeline runs as STAGED small programs (models/pipeline.py
    make_pipeline_staged): one monolithic program holding all ~8 sorts has
    twice hung or crashed the remote compile service; the staged form
    compiles each piece separately and the five placement sorts share one
    executable;
  * the headline variant's fenced scalar depends on every materialized
    join_out column, so the record materialization cannot be DCE'd
    (round-1 weakness: counters-only bench); a counters-only variant is
    reported alongside.

Prints per-op roofline lines (fraction of HBM speed-of-light, the north
star's >=80% target) on stderr and ONE JSON line on stdout.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

ROWS = 1_000_000
if "--rows" in sys.argv:  # smoke-testing override (CPU CI)
    ROWS = int(sys.argv[sys.argv.index("--rows") + 1])
KEY_RANGE = max(3 * ROWS // 10, 1)
K = 6  # queued dispatch rounds per steady-state timing
BASELINE_ROWS_PER_S = 155_700.0  # BASELINE.md MergeJoin pipeline, 1 x86 core


def fence(out) -> float:
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.asarray(leaf).reshape(-1)[0])


def timed_calls(call, args, reps=2):
    """(per_round_s, warmup_s) for a python callable that dispatches jitted
    programs (possibly several) and returns device output."""
    t0 = time.perf_counter()
    fence(call(*args))
    warm_s = time.perf_counter() - t0
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        fence(call(*args))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = None
        for _ in range(K):
            out = call(*args)
        fence(out)
        tk = time.perf_counter() - t0
        best = min(best, max((tk - t1) / (K - 1), 1e-9))
    return best, warm_s


def main() -> int:
    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    from database_technology_algorithms_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache(tag="cpu" if "--cpu" in sys.argv else "tpu")
    from database_technology_algorithms_tpu.io.device_gen import generate_device_batch
    from database_technology_algorithms_tpu.models.pipeline import (
        make_pipeline_staged,
    )
    from database_technology_algorithms_tpu.ops.distinct import distinct_impl
    from database_technology_algorithms_tpu.ops.hash_join import hash_join_count_impl
    from database_technology_algorithms_tpu.ops.sort import sort_keys, survivor_dest
    from database_technology_algorithms_tpu.utils.roofline import audit

    dev = jax.devices()[0]
    k1, k2 = jax.random.split(jax.random.PRNGKey(42))
    t0 = time.perf_counter()
    r = generate_device_batch(k1, ROWS, key_range=KEY_RANGE)
    s = generate_device_batch(k2, ROWS, key_range=KEY_RANGE)
    jax.block_until_ready((r, s))
    gen_s = time.perf_counter() - t0

    results = []
    merge_nres = hash_nres = -1

    def run(name, call, args, audit_op, rows):
        try:
            per, c = timed_calls(call, args)
        except Exception as e:  # remote compile service flakes: keep going
            print(f"# {name} FAILED: {type(e).__name__}: {e}", file=sys.stderr)
            results.append((name, None, 0.0, audit_op, rows))
            return None
        results.append((name, per, c, audit_op, rows))
        return per

    staged = make_pipeline_staged(1)

    def pipe_mat(r, s):
        out = staged(r, s)
        j = out["join_out"]
        chk = (
            jnp.sum(j.recid, dtype=jnp.uint32)
            + jnp.sum(j.num, dtype=jnp.uint32)
            + jnp.sum(j.strw, dtype=jnp.uint32)
        )
        return chk, out["merge_nres"], out["hash_nres"]

    per_mat = run("pipeline_materialized", pipe_mat, (r, s), "pipeline", ROWS)
    if per_mat is not None:
        out = pipe_mat(r, s)
        merge_nres, hash_nres = int(out[1]), int(out[2])

    # same pipeline, record materialization through the replicated-key 2-D
    # sort engine (one 2-operand [N,33] sort instead of five 8-operand ones)
    from database_technology_algorithms_tpu.config import EngineConfig

    staged2d = make_pipeline_staged(1, EngineConfig(materialize="sort2d"))

    def pipe_mat_2d(r, s):
        out = staged2d(r, s)
        j = out["join_out"]
        chk = (
            jnp.sum(j.recid, dtype=jnp.uint32)
            + jnp.sum(j.num, dtype=jnp.uint32)
            + jnp.sum(j.strw, dtype=jnp.uint32)
        )
        return chk, out["merge_nres"], out["hash_nres"]

    per_mat2d = run("pipeline_materialized_2d", pipe_mat_2d, (r, s), "pipeline", ROWS)
    if per_mat2d is not None and per_mat is not None:
        a, b = pipe_mat(r, s), pipe_mat_2d(r, s)
        if int(a[0]) != int(b[0]):
            print(
                f"# ENGINE MISMATCH place35 chk={int(a[0])} sort2d chk={int(b[0])}",
                file=sys.stderr,
            )
            per_mat2d = None
            results[-1] = ("pipeline_materialized_2d", None, 0.0, "pipeline", ROWS)

    # counters-only: the monolith program returning only the counters — XLA
    # DCEs the materialization sorts, leaving the one fused view sort
    from database_technology_algorithms_tpu.models.pipeline import (
        pipeline_single_impl,
    )

    def _counters_program(r, s):
        out = pipeline_single_impl(r, s, field=1)
        return out["merge_nres"], out["hash_nres"], out["nunique_r"]

    run(
        "pipeline_counters_only",
        jax.jit(_counters_program),
        (r, s),
        "pipeline",
        ROWS,
    )

    # ---- per-op audits: (dest program) + the SHARED place35 executable ---
    from database_technology_algorithms_tpu.ops.movement import place35

    jit_place35 = jax.jit(place35)

    def _sort_stage(r):
        view = sort_keys(r, 1)
        from database_technology_algorithms_tpu.ops.movement import sort_words

        _, (dest,) = sort_words(
            [view.perm.astype(jnp.uint32)],
            (jnp.arange(r.nrows, dtype=jnp.int32),),
            stable_iota=False,
        )
        return dest.astype(jnp.uint32)

    jit_sortdest = jax.jit(_sort_stage)

    def sort_call(r):
        dest = jit_sortdest(r)
        return jit_place35(dest, jnp.int32(ROWS), *r.payload_words())[1]

    run("sort", sort_call, (r,), "sort", ROWS)

    def _distinct_stage(r):
        from database_technology_algorithms_tpu.ops.distinct import distinct_view

        view, keep = distinct_view(r, 1)
        dest, cnt = survivor_dest(view.perm, keep)
        return dest.astype(jnp.uint32), cnt

    jit_distdest = jax.jit(_distinct_stage)

    def distinct_call(r):
        dest, cnt = jit_distdest(r)
        return jit_place35(dest, cnt, *r.payload_words())[1]

    run("distinct", distinct_call, (r,), "distinct", ROWS)

    jit_hj = jax.jit(lambda r, s: hash_join_count_impl(r, s, 1)[2])
    run("hash_join_count", jit_hj, (r, s), "hash_join", ROWS)

    # ---- report -----------------------------------------------------------
    print(
        f"# device={dev.platform} gen={gen_s:.2f}s K={K} "
        f"merge_nres={merge_nres} hash_nres={hash_nres} "
        f"agree={merge_nres == hash_nres}",
        file=sys.stderr,
    )
    detail = {}
    headline = None
    for name, per, c, op, rows in results:
        if per is None:
            detail[name] = {"error": "compile_failed"}
            continue
        a = audit(op, rows, per, device=dev)
        detail[name] = {
            "ms": round(per * 1e3, 3),
            "warmup_s": round(c, 1),
            "fraction_of_sol": round(a.fraction_of_sol, 4),
            "rows_per_s": round(rows / per, 1),
        }
        if name.startswith("pipeline_materialized") and (
            headline is None or per < headline
        ):
            headline = per
        print(
            f"# roofline {name:24s} {per*1e3:9.2f} ms  "
            f"{100*a.fraction_of_sol:5.1f}% of {a.sol_gbps:.0f} GB/s SoL  "
            f"({rows/per/1e6:.2f} M rows/s)  warmup={c:.0f}s",
            file=sys.stderr,
        )

    if headline is None:
        print(json.dumps({"metric": "mergejoin_pipeline_rows_per_s_1chip",
                          "value": 0, "unit": "rows/s", "vs_baseline": 0,
                          "error": "all timings failed"}))
        return 1
    rows_per_s = ROWS / headline
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
