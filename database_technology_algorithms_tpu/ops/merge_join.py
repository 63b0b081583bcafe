"""Sort-merge join (distinct-key intersection, R-side emission).

Reference semantics (``DatabaseProject.cpp:384-502``): MergeJoin first runs
EliminateDuplicates on *both* inputs (``:393-394``), so the join is a
**set-semantics join on distinct key values**; the two-pointer merge then
emits, for each key present on both sides, the R-side record only (``:454``).
``nres`` = matched-key count.

The two-pointer loop is inherently serial, so the TPU form is a
**sorted-concatenation intersection**: tag R/S rows, sort the union by
(active, key, side, row); post-distinct each side's keys are unique, so a
matched key appears as an adjacent [R, S] pair — one vectorized adjacency
check finds every match.  This also composes with arbitrary-width string keys
(no 1D searchsorted needed) and inherits sort.py's exact string fallback.

Padding rows (capacity beyond the live count) sort to the tail via a leading
"inactive" word and can never match.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..batch import RecordBatch
from ..config import DEFAULT_CONFIG, EngineConfig
from .distinct import distinct_impl
from .filter import compact
from .keys import rows_equal_on_field
from .sort import sort_perm_extended


def join_sorted_distinct_impl(
    r: RecordBatch,
    r_count: jax.Array,
    s: RecordBatch,
    s_count: jax.Array,
    field,
    cfg: EngineConfig = DEFAULT_CONFIG,
) -> tuple[RecordBatch, jax.Array]:
    """Intersect two batches whose first r_count/s_count rows hold unique
    keys in sorted key order (i.e. distinct() outputs).

    Returns (r_matched, nres): R rows whose key also appears in S, in R's
    order, compacted to the front of an R-capacity batch.

    u32 key domains probe S via searchsorted (no concat sort, one fused
    payload gather); strings use the exact sorted-concat path (which only
    needs unique, not sorted, inputs).
    """
    from .fastpath import intersect_sorted_unique_u32, is_u32_field

    if is_u32_field(field):
        return intersect_sorted_unique_u32(r, r_count, s, s_count, field)
    nr, ns = r.nrows, s.nrows
    both = RecordBatch.concat([r, s])
    n = nr + ns
    idx = jnp.arange(n, dtype=jnp.int32)
    side = (idx >= nr).astype(jnp.uint32)  # 0 = R, 1 = S
    active = jnp.where(idx < nr, idx < r_count, (idx - nr) < s_count)
    inactive_w = (~active).astype(jnp.uint32)

    perm = sort_perm_extended(
        both, field, cfg, pre_words=(inactive_w,), post_words=(side,)
    )
    lo, hi = perm[:-1], perm[1:]
    pair_match = (
        rows_equal_on_field(both, field, lo, hi)
        & (side[lo] == 0)
        & (side[hi] == 1)
        & active[lo]
        & active[hi]
    )
    # scatter matches back to R row space
    matched_r = jnp.zeros(nr, dtype=bool).at[lo].set(pair_match, mode="drop")
    out, nres = compact(r, matched_r)
    return out, nres


from ._jit import per_static_jit

join_sorted_distinct = per_static_jit(join_sorted_distinct_impl)


def merge_join_impl(
    r: RecordBatch,
    s: RecordBatch,
    field,
    cfg: EngineConfig = DEFAULT_CONFIG,
) -> tuple[RecordBatch, jax.Array, dict]:
    """Full reference MergeJoin pipeline: distinct(R), distinct(S), intersect.

    Returns (r_matched_batch, nres, stats_dict with nunique_r/nunique_s).
    """
    r_d, nu_r = distinct_impl(r, field, cfg)
    s_d, nu_s = distinct_impl(s, field, cfg)
    out, nres = join_sorted_distinct_impl(r_d, nu_r, s_d, nu_s, field, cfg)
    return out, nres, {"nunique_r": nu_r, "nunique_s": nu_s}


merge_join = per_static_jit(merge_join_impl)
