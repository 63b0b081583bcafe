"""Sort-merge join (distinct-key intersection, R-side emission).

Reference semantics (``DatabaseProject.cpp:384-502``): MergeJoin first runs
EliminateDuplicates on *both* inputs (``:393-394``), so the join is a
**set-semantics join on distinct key values**; the two-pointer merge then
emits, for each key present on both sides, the R-side record only (``:454``).
``nres`` = matched-key count.

The two-pointer loop is inherently serial; the TPU form is a
**sorted-concatenation intersection**: tag R/S rows, key-sort the union by
(active, key, side); post-distinct each side's keys are unique, so every
matched key appears as an adjacent [R, S] pair — one adjacency check finds
all matches and one fused gather emits the matched R records.  Key-word
sorts only (see sort.py for why); strings inherit the exact prefix/LSD
fallback.

Padding rows (capacity beyond the live count) sort to the tail via a leading
"inactive" word and can never match.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..batch import RecordBatch, canonical_field
from ..config import DEFAULT_CONFIG, EngineConfig
from ._jit import per_static_jit
from .distinct import distinct_impl
from .sort import sort_keys


def join_view(
    r: RecordBatch,
    r_count: jax.Array,
    s: RecordBatch,
    s_count: jax.Array,
    field,
    cfg: EngineConfig = DEFAULT_CONFIG,
):
    """Key-level intersection core over the concatenated pair.

    Returns (concat_batch, view, matched_sorted): matched_sorted marks, at
    sorted positions, the R row of each matched [R, S] adjacency.
    """
    nr = r.nrows
    both = RecordBatch.concat([r, s])
    n = both.nrows
    idx = jnp.arange(n, dtype=jnp.int32)
    active = jnp.where(idx < nr, idx < r_count, (idx - nr) < s_count)
    inactive_w = (~active).astype(jnp.uint32)

    # side is neither a sort word nor payload: the row-index stability key
    # is monotone in side (R rows occupy [0, nr)), so (inactive, key, iota)
    # already orders R before S within a key; sorted side = perm >= nr
    view = sort_keys(
        both, field, cfg,
        pre_words=(inactive_w,),
        extra=(active.astype(jnp.uint32),),
        pre_is_mask=True,
    )
    (s_act,) = view.extras
    s_side = (view.perm >= nr).astype(jnp.uint32)
    eq_next = view.adj_eq[1:]  # sorted row p+1 equals row p
    pair = (
        eq_next
        & (s_side[:-1] == 0)
        & (s_side[1:] == 1)
        & (s_act[:-1] == 1)
        & (s_act[1:] == 1)
    )
    matched = jnp.concatenate([pair, jnp.zeros(1, dtype=bool)])
    return both, view, matched


def join_sorted_distinct_impl(
    r: RecordBatch,
    r_count: jax.Array,
    s: RecordBatch,
    s_count: jax.Array,
    field,
    cfg: EngineConfig = DEFAULT_CONFIG,
) -> tuple[RecordBatch, jax.Array]:
    """Intersect two batches whose first r_count/s_count rows hold unique keys.

    Returns (r_matched, nres): R rows whose key also appears in S, in sorted
    key order (the order distinct() emits), compacted to the front of an
    R-capacity batch.

    Matched rows are always R-side, so the TPU placement path computes each
    row's destination over the concatenation but moves only the R half
    (grouped placement sorts at R capacity, not 2x); the gather path
    materializes from the concatenation and slices.
    """
    from .movement import (
        permute_rows,
        place_join_by_key,
        use_sort_placement,
    )
    from .sort import materialize_survivors, survivor_dest

    fld = canonical_field(field)
    both, view, matched = join_view(r, r_count, s, s_count, field, cfg)
    if use_sort_placement(cfg):
        if (
            fld in (0, 1)
            and cfg.packed_u32_sorts
            and cfg.materialize != "sort2d"
            and 4 + r.str_words <= 8
            # the packed back-sort/valid-fold kernels pack iota below the
            # flag bits: n < 2^30 (mirrors models/pipeline._direct_place)
            and r.nrows + s.nrows < (1 << 30)
        ):
            # u32 keys: skip the dest permutation — matched packs into the
            # perm word (1-op back sort) and the survivor placement IS a
            # direct sort of R by (unmatched, key) (r4, movement.py)
            from .movement import packed_keep_backsort

            nres = jnp.sum(matched, dtype=jnp.int32)
            matched_r = packed_keep_backsort(view.perm, matched, r.nrows)
            key_r = r.recid if fld == 0 else r.num
            return place_join_by_key(
                matched_r, key_r, nres, r,
                key_plane="recid" if fld == 0 else "num",
            ), nres
        dest, nres = survivor_dest(view.perm, matched)
        # every matched rank lives in the R half; unmatched R rows keep
        # unique sink destinations >= nres, so dest[:nr] is still unique
        out = permute_rows(r, dest[: r.nrows], count=nres, cfg=cfg)
        return out, nres
    out, nres = materialize_survivors(both, view.perm, matched, cfg)
    return out.slice(0, r.nrows), nres


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
