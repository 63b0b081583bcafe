"""Duplicate elimination (sort-based DISTINCT on the join field).

Reference semantics (``DatabaseProject.cpp:94-170``): sort by the field, then
stream once keeping a record only when its key differs from the previous
record's — i.e. keep the *first* record of each equal-key group, survivors in
sorted key order.  ``nunique`` counts all unique keys.

TPU form: one key-word sort (sort.SortedView), keep-mask from the exact
adjacency, one fused record gather of the survivors (sort.materialize_
survivors).  Two reference bugs are deliberately *not* reproduced
(SURVEY.md §2 C5): the unflushed final block (tail rows silently dropped
from its output file) and the uninitialized first comparison; the parity
harness models both on the oracle side.

Survivor identity: the reference's qsort is unstable, so *which* record of a
duplicate group survives is unspecified there; here it is deterministically
the lowest-original-index record (total-order sort in sort.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..batch import RecordBatch
from ..config import DEFAULT_CONFIG, EngineConfig
from ._jit import per_static_jit
from .keys import adjacent_equal
from .movement import compact_rows
from .sort import SortedView, materialize_survivors, sort_keys


def distinct_view(
    batch: RecordBatch,
    field,
    cfg: EngineConfig = DEFAULT_CONFIG,
    count: jax.Array | None = None,
    active: jax.Array | None = None,
) -> tuple[SortedView, jax.Array]:
    """Key-level DISTINCT: returns (view, keep_sorted) without moving rows.

    keep_sorted marks, in sorted order, the first row of each live key
    group.  Live rows are the first `count` rows, or an arbitrary `active`
    mask (e.g. a filter predicate — filtering then costs nothing: inactive
    rows just sink to the sort tail).  Composed pipelines stay at the word
    level and materialize once at the end (models/pipeline.py).
    """
    n = batch.nrows
    if count is not None:
        live = jnp.arange(n, dtype=jnp.int32) < count
        # active and count COMPOSE: a predicate mask must still exclude
        # capacity-padding rows past the live count (r4 review: passing
        # both silently dropped count)
        active = live if active is None else active & live
    pre = ()
    extra = ()
    if active is not None:
        pre = ((~active).astype(jnp.uint32),)
        extra = (active.astype(jnp.uint32),)
    view = sort_keys(batch, field, cfg, pre_words=pre, extra=extra,
                     pre_is_mask=True)
    keep = ~view.adj_eq
    if active is not None:
        keep &= view.extras[0] == 1
    return view, keep


def distinct_sorted(
    sorted_batch: RecordBatch, field, count: jax.Array | None = None
) -> tuple[RecordBatch, jax.Array]:
    """DISTINCT over an already key-sorted batch. Returns (batch, nunique)."""
    keep = ~adjacent_equal(sorted_batch, field)
    if count is not None:
        keep &= jnp.arange(sorted_batch.nrows, dtype=jnp.int32) < count
    out, n, _ = compact_rows(sorted_batch, keep)
    return out, n


def distinct_impl(
    batch: RecordBatch,
    field,
    cfg: EngineConfig = DEFAULT_CONFIG,
    count: jax.Array | None = None,
    active: jax.Array | None = None,
) -> tuple[RecordBatch, jax.Array]:
    """Sort + DISTINCT (the reference's EliminateDuplicates pipeline).

    Returns (batch_with_capacity_N, nunique); rows past nunique are zeroed.
    Output rows are in sorted key order, matching the reference's output
    order.  `count` marks live rows under the static-capacity convention;
    `active` is an arbitrary additional liveness mask (e.g. the valid
    predicate — composes with count, see distinct_view).
    One key sort + one record gather.
    """
    from ..batch import canonical_field
    from ..utils.checks import ensure_device_budget

    ensure_device_budget(batch.nrows, cfg, "distinct")
    fld = canonical_field(field)
    if (
        fld in (0, 1)
        and cfg.u32_distinct_engine == "fastpath"
        and active is None
    ):
        from .fastpath import distinct_u32

        return distinct_u32(batch, field, count=count)
    view, keep = distinct_view(batch, field, cfg, count=count, active=active)
    from .movement import use_sort_placement

    if (
        fld in (0, 1)
        and cfg.packed_u32_sorts
        and use_sort_placement(cfg)
        and cfg.materialize != "sort2d"
        and 4 + batch.str_words <= 8
        and batch.nrows < (1 << 30)
    ):
        # direct-sort materialization (r5, the join's r4 trick applied
        # to DISTINCT): "survivors first, in key order" IS a sort of the
        # batch by (dropped, key, iota), so skip the dense survivor_dest
        # permutation (a 2-operand un-permute) — one 1-operand packed
        # back-sort hands keep to original order, and the placement
        # rides the packed key words with the key column reconstructed
        # (movement.place_join_by_key key_plane) — 2 fewer operand
        # passes than survivor_dest + place_batch
        from .movement import packed_keep_backsort, place_join_by_key

        n = batch.nrows
        nunique = jnp.sum(keep, dtype=jnp.int32)
        keep_orig = packed_keep_backsort(view.perm, keep, n)
        key = batch.recid if fld == 0 else batch.num
        out = place_join_by_key(
            keep_orig, key, nunique, batch,
            key_plane="recid" if fld == 0 else "num",
        )
        return out, nunique
    return materialize_survivors(batch, view.perm, keep, cfg)


_distinct_jit = per_static_jit(distinct_impl)


def distinct(
    batch: RecordBatch,
    field,
    cfg: EngineConfig = DEFAULT_CONFIG,
    count: jax.Array | None = None,
    active: jax.Array | None = None,
) -> tuple[RecordBatch, jax.Array]:
    """Public host-level form: in-budget batches hit the jitted kernel;
    over-budget batches ROUTE through the chunked two-pass driver
    (ops/chunked.py) instead of raising (VERDICT r4 #3b).  The jit-safe
    core (``distinct_impl``) keeps its trace-time gate for in-jit use."""
    if batch.nrows > cfg.mem_rows:
        from .chunked import distinct_chunked

        return distinct_chunked(batch, field, cfg, count, active=active)
    return _distinct_jit(batch, field, cfg, count, active)
