#!/usr/bin/env python
"""Composed-floor accounting of the headline pipeline (VERDICT r4 #1).

Measures, with the fenced steady-state estimator, every component of the
production staged pipeline at 1M+1M rows and prints the decomposition

    headline = stage_a + place + chk + dispatch-residual
    stage_a  = view-sort + back-sort + scans + elementwise-residual

against the measured per-primitive floor (PERF_NOTES r4: ~1.15 ms/operand
full reorder at 2M rows).  Every timing consumes a checksum over EVERY
output (the dead-sort-operand trap) and ends with a device->host readback
(the non-fencing block_until_ready trap).

Run on the TPU (no other load!); results go into PERF_NOTES.md.
"""
import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

import jax
import jax.numpy as jnp

from database_technology_algorithms_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache(tag="tpu" if "--cpu" not in sys.argv else "cpu")
if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

from database_technology_algorithms_tpu.config import EngineConfig
from database_technology_algorithms_tpu.io.device_gen import generate_device_batch
from database_technology_algorithms_tpu.models.pipeline import make_pipeline_staged
from database_technology_algorithms_tpu.utils.profiling import fence, timed_steady

ROWS = 1_000_000 if "--rows" not in sys.argv else int(
    sys.argv[sys.argv.index("--rows") + 1]
)


def main():
    k1, k2 = jax.random.split(jax.random.PRNGKey(42))
    r = generate_device_batch(k1, ROWS, key_range=max(3 * ROWS // 10, 1))
    s = generate_device_batch(k2, ROWS, key_range=max(3 * ROWS // 10, 1))
    jax.block_until_ready((r, s))
    n2 = 2 * ROWS
    cfg = EngineConfig()
    run = make_pipeline_staged(1, cfg)

    res = {}
    import time as _time

    def steady_nojit(call, args, k=8, reps=3):
        """timed_steady's estimator WITHOUT re-jitting: `call` already
        dispatches compiled programs (re-jitting would trace a new module
        name and could miss the persistent cache on a 90 s program)."""
        fence(call(*args))
        t1s, tks = [], []
        for _ in range(reps):
            t0 = _time.perf_counter()
            fence(call(*args))
            t1s.append(_time.perf_counter() - t0)
            t0 = _time.perf_counter()
            out = None
            for _ in range(k):
                out = call(*args)
            fence(out)
            tks.append(_time.perf_counter() - t0)
        return max((min(tks) - min(t1s)) / (k - 1), 1e-9)

    def rep(name, fn, args, k=8, jit=True):
        if jit:
            per, comp = timed_steady(fn, args, k=k)
            note = f"   (compile {comp:.1f}s)"
        else:
            per = steady_nojit(fn, args, k=k)
            note = ""
        res[name] = per * 1e3
        print(f"{name:34s} {per*1e3:8.3f} ms{note}", flush=True)
        return per

    # ---- the composed programs ----------------------------------------
    chk_fn = jax.jit(
        lambda j: jnp.sum(j.recid, dtype=jnp.uint32)
        + jnp.sum(j.num, dtype=jnp.uint32)
        + jnp.sum(j.strw, dtype=jnp.uint32)
    )

    def whole(r, s):
        out = run(r, s)
        return chk_fn(out["join_out"]), out["merge_nres"], out["hash_nres"]

    rep("HEADLINE (staged whole)", whole, (r, s), jit=False)

    out_a = run.stage_a(r, s)
    fence(out_a)
    out_j = run(r, s)["join_out"]
    fence(out_j)

    rep("stage_a (view+scans+backsort)", lambda r, s: run.stage_a(r, s),
        (r, s), jit=False)
    rep("place (5-op join placement)",
        lambda r, s: run.materialize(out_a, r, s), (r, s), jit=False)
    rep("chk (jitted checksum)", lambda r, s: chk_fn(out_j), (r, s),
        jit=False)

    # ---- stage_a's internals ------------------------------------------
    from database_technology_algorithms_tpu.ops.sort import packed_u32_view_sort

    both_key = jnp.concatenate([r.num, s.num])
    inact = jnp.zeros(n2, jnp.uint32)

    def view_sort(inact, key):
        s_key, perm, s_act, _ = packed_u32_view_sort(inact, key)
        return (
            jnp.sum(s_key, dtype=jnp.uint32)
            + jnp.sum(perm.astype(jnp.uint32))
            + jnp.sum(s_act.astype(jnp.uint32))
        )

    rep("view sort (packed 2-op @2M)", view_sort, (inact, both_key))

    packed = (jnp.arange(n2, dtype=jnp.uint32) << 1) | 1

    def back_sort(p):
        (sp,) = jax.lax.sort((p,), num_keys=1)
        return jnp.sum(sp, dtype=jnp.uint32)

    rep("back-sort (packed 1-op @2M)", back_sort, (packed,))

    from database_technology_algorithms_tpu.ops.scan import seg_carry, seg_max

    flags = (jnp.arange(n2) % 3) == 0
    vals = jnp.arange(n2, dtype=jnp.uint32)

    def scans(flags, vals):
        a = seg_carry(flags, vals)
        b = jnp.flip(seg_max(jnp.flip(flags), jnp.flip(vals)))
        return jnp.sum(a, dtype=jnp.uint32) + jnp.sum(b, dtype=jnp.uint32)

    rep("scans (seg_carry+seg_max @2M)", scans, (flags, vals))

    # ---- the accounting ------------------------------------------------
    parts = (
        res["stage_a (view+scans+backsort)"]
        + res["place (5-op join placement)"]
        + res["chk (jitted checksum)"]
    )
    inner = (
        res["view sort (packed 2-op @2M)"]
        + res["back-sort (packed 1-op @2M)"]
        + res["scans (seg_carry+seg_max @2M)"]
    )
    print()
    print(f"headline          = {res['HEADLINE (staged whole)']:.3f} ms")
    print(f"  stage_a + place + chk = {parts:.3f} ms")
    print(f"  dispatch residual     = "
          f"{res['HEADLINE (staged whole)'] - parts:+.3f} ms")
    print(f"stage_a           = {res['stage_a (view+scans+backsort)']:.3f} ms")
    print(f"  view + back + scans   = {inner:.3f} ms")
    print(f"  elementwise residual  = "
          f"{res['stage_a (view+scans+backsort)'] - inner:+.3f} ms")


if __name__ == "__main__":
    main()
