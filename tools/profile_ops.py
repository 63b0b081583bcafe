#!/usr/bin/env python
"""Per-operator on-chip roofline report (the north star's >=80%-of-SoL audit).

Times every engine operator and the hot movement primitives at 1M rows with
the steady-state fenced methodology (utils/profiling.timed_steady — naive
block_until_ready timing lies through the axon tunnel, PERF_NOTES.md) and
prints each as measured rows/s against the HBM-bandwidth speed-of-light
model (utils/roofline).  Run with --cpu for a smoke pass.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from database_technology_algorithms_tpu.utils.cache import enable_persistent_cache


def main():
    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    enable_persistent_cache(tag="cpu" if "--cpu" in sys.argv else "tpu")

    from database_technology_algorithms_tpu.io.device_gen import generate_device_batch
    from database_technology_algorithms_tpu.models.pipeline import pipeline_single_impl
    from database_technology_algorithms_tpu.ops.aggregate import group_aggregate_impl
    from database_technology_algorithms_tpu.ops.distinct import distinct_impl
    from database_technology_algorithms_tpu.ops.filter import compact
    from database_technology_algorithms_tpu.ops.hash_join import hash_join_count_impl
    from database_technology_algorithms_tpu.ops.merge_join import merge_join_impl
    from database_technology_algorithms_tpu.ops.movement import permute_rows
    from database_technology_algorithms_tpu.ops.sort import sort_batch_impl
    from database_technology_algorithms_tpu.utils.profiling import timed_steady
    from database_technology_algorithms_tpu.utils.roofline import audit, report

    n = 1_000_000 if "--cpu" not in sys.argv else 100_000
    key_range = max(n // 3, 1)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    r = generate_device_batch(k1, n, key_range=key_range)
    s = generate_device_batch(k2, n, key_range=key_range)
    dest = jax.random.permutation(jax.random.PRNGKey(3), n).astype(jnp.uint32)
    mask = jax.random.uniform(jax.random.PRNGKey(4), (n,)) < 0.3
    jax.block_until_ready((r, s, dest, mask))
    dev = jax.devices()[0]
    print(f"device: {dev}  rows: {n}", flush=True)

    results = []

    row_b = 4 * (3 + r.str_words)  # actual stored footprint (narrow width)

    # NOTE (r3): consume a checksum over EVERY output column.  XLA's sort
    # simplifier prunes dead sort operands, so consuming only .num lets the
    # compiler shrink a grouped placement sort to (key, num) and the line
    # measures a fantasy (this bit round-3's first profile).
    def _chk(b):
        return (
            jnp.sum(b.recid, dtype=jnp.uint32)
            + jnp.sum(b.num, dtype=jnp.uint32)
            + jnp.sum(b.strw, dtype=jnp.uint32)
            + jnp.sum(b.valid)
        )

    def run(name, fn, args, op, payload_bytes=None):
        per, c = timed_steady(fn, args)
        a = audit(op, n, per, payload_bytes=payload_bytes or row_b, device=dev)
        a.op = name
        results.append(a)
        print(a.line() + f"  compile={c:.0f}s", flush=True)

    run("filter+compact", lambda r: _chk(compact(r, mask)[0]), (r,), "filter")
    run(
        "sort_batch",
        lambda r: _chk(sort_batch_impl(r, 1)[0]),
        (r,),
        "sort",
    )
    run(
        "distinct",
        lambda r: _chk(distinct_impl(r, 1)[0]),
        (r,),
        "distinct",
    )
    run(
        "merge_join (2x distinct + intersect)",
        lambda r, s: _chk(merge_join_impl(r, s, 1)[0]),
        (r, s),
        "merge_join",
    )
    run(
        "hash_join_count",
        lambda r, s: hash_join_count_impl(r, s, 1)[2],
        (r, s),
        "hash_join",
    )
    run(
        "group_aggregate",
        lambda s: group_aggregate_impl(s, 1, materialize_reps=False)[2],
        (s,),
        "aggregate",
    )
    run(
        "permute_rows (narrow 3+K-word placement)",
        lambda r, d: _chk(permute_rows(r, d)),
        (r, dest),
        "compact",
    )
    run(
        "pipeline_single (materialized)",
        lambda r, s: _chk(pipeline_single_impl(r, s, 1)["join_out"]),
        (r, s),
        "pipeline",
    )
    if "--engines" in sys.argv:
        # alternative join engines at the same shapes (PERF_NOTES matrix)
        from database_technology_algorithms_tpu.config import EngineConfig

        for eng in ("bucketed", "searchsorted"):
            cfg_e = EngineConfig(u32_join_engine=eng)
            run(
                f"hash_join_count[{eng}]",
                lambda r, s, _c=cfg_e: hash_join_count_impl(r, s, 1, _c)[2],
                (r, s),
                "hash_join",
            )
    if "--wide" in sys.argv:
        # full-width strings: the wide materializer (VERDICT r2 #2 baseline)
        from database_technology_algorithms_tpu.batch import STR_WORDS

        rw = r.pad_str_words(STR_WORDS)
        jax.block_until_ready(rw)
        run(
            "permute_rows (wide 35-word placement)",
            lambda rw, d: _chk(permute_rows(rw, d)),
            (rw, dest),
            "compact",
            payload_bytes=140,
        )
        run(
            "wide record gather (jnp.take)",
            lambda rw, d: _chk(rw.take(d.astype(jnp.int32))),
            (rw, dest),
            "compact",
            payload_bytes=140,
        )

    print("\n" + report(results), flush=True)


if __name__ == "__main__":
    main()
