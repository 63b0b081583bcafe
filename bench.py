#!/usr/bin/env python
"""Benchmark: full reference pipeline (sort→distinct→join→aggregate) on TPU.

Headline metric vs BASELINE.md: the reference MergeJoin pipeline (2× external
sort + dedup + join) processes 1M rows/file in 6.42 s single-core ⇒ 155.7k
rows/s.  This runs the same logical pipeline (plus the raw-input hash join
cross-check and a hash aggregate) as one XLA program on one TPU chip, data
generated on-device (reference distribution: num uniform in [0, 30*nblocks)).

Prints ONE JSON line:
  {"metric": ..., "value": rows/s, "unit": "rows/s", "vs_baseline": x}
"""

import json
import sys
import time

import jax

ROWS = 1_000_000
KEY_RANGE = 300_000
BASELINE_ROWS_PER_S = 155_700.0  # BASELINE.md MergeJoin pipeline, 1 x86 core


def main() -> int:
    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    from database_technology_algorithms_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache(tag="cpu" if "--cpu" in sys.argv else "tpu")
    from database_technology_algorithms_tpu.io.device_gen import generate_device_batch
    from database_technology_algorithms_tpu.models.pipeline import pipeline_single

    dev = jax.devices()[0]
    k1, k2 = jax.random.split(jax.random.PRNGKey(42))
    t0 = time.perf_counter()
    r = generate_device_batch(k1, ROWS, key_range=KEY_RANGE)
    s = generate_device_batch(k2, ROWS, key_range=KEY_RANGE)
    jax.block_until_ready((r, s))
    gen_s = time.perf_counter() - t0

    def step(r, s):
        out = pipeline_single(r, s, field=1)
        return (
            out["merge_nres"],
            out["hash_nres"],
            out["nunique_r"],
            out["nunique_s"],
            out["agg_groups"],
        )

    fn = jax.jit(step)
    t0 = time.perf_counter()
    out = fn(r, s)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(r, s)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    best = min(times)
    merge_nres, hash_nres = int(out[0]), int(out[1])

    rows_per_s = ROWS / best
    print(
        f"# device={dev.platform} gen={gen_s:.2f}s compile={compile_s:.2f}s "
        f"best={best:.4f}s times={[f'{t:.4f}' for t in times]} "
        f"merge_nres={merge_nres} hash_nres={hash_nres} agree={merge_nres == hash_nres}",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "mergejoin_pipeline_rows_per_s_1chip",
                "value": round(rows_per_s, 1),
                "unit": "rows/s",
                "vs_baseline": round(rows_per_s / BASELINE_ROWS_PER_S, 2),
            }
        )
    )
    return 0 if merge_nres == hash_nres else 1


if __name__ == "__main__":
    raise SystemExit(main())
