"""Hash aggregate / group-by.

The reference's only aggregate is duplicate elimination (a COUNT-less
group-by, ``DatabaseProject.cpp:94-170``) plus the key-set collapse inside
HashJoin's build phase (``:510-548``).  BASELINE.json's north star asks for a
real masked aggregate kernel, so this module generalizes both: group rows by
the join field and compute count / sum / min / max over ``num`` per group.

TPU form: one payload-carrying key sort, then cumulative/segmented scans
(ops/scan.py) with per-group values read off at run boundaries via
compaction-by-sort — deterministic, collision-free, exact for string keys,
and free of the gathers/scatters a literal hash aggregate would need
(see movement.py for why that matters ~300x on this chip).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..batch import RecordBatch
from ..config import DEFAULT_CONFIG, EngineConfig
from ._jit import per_static_jit
from .movement import compact_words
from .scan import seg_max, seg_min
from .sort import materialize_survivors, sort_keys

U32_MAX = np.uint32(0xFFFFFFFF)


def _run_aggregates(
    batch, view, active_s, count_vals, sum_vals, min_vals, max_vals,
    cfg, materialize_reps,
):
    """Shared run-boundary accounting for both aggregate phases.

    Given the sorted view, the sorted activity mask and per-row
    (count, sum, min, max) contributions, derive run starts/ends, scan,
    read per-group values off at run ends, and optionally materialize the
    group representative rows (r4 review: this tail existed twice).
    """
    from .scan import cumsum as _bcumsum

    n = batch.nrows
    adj = view.adj_eq
    new_run = active_s & ~adj
    nxt_active = jnp.concatenate([active_s[1:], jnp.zeros(1, dtype=bool)])
    nxt_same = jnp.concatenate([adj[1:], jnp.zeros(1, dtype=bool)])
    is_end = active_s & (~nxt_active | ~nxt_same)

    c_incl = _bcumsum(jnp.where(active_s, count_vals, 0).astype(jnp.int32))
    s_incl = _bcumsum(jnp.where(active_s, sum_vals, 0).astype(jnp.uint32))
    run_min = seg_min(new_run, jnp.where(active_s, min_vals, U32_MAX))
    run_max = seg_max(new_run, jnp.where(active_s, max_vals, jnp.uint32(0)))

    if materialize_reps:
        reps, n_groups = materialize_survivors(batch, view.perm, new_run, cfg)
    else:
        reps = batch.slice(0, 1)  # placeholder; callers using counters only
        n_groups = jnp.sum(new_run, dtype=jnp.int32)
    _, (ec, es, emin, emax) = compact_words(
        is_end, (c_incl, s_incl, run_min, run_max)
    )
    gidx = jnp.arange(n, dtype=jnp.int32)
    live_g = gidx < n_groups
    prev_c = jnp.concatenate([jnp.zeros(1, jnp.int32), ec[:-1]])
    prev_s = jnp.concatenate([jnp.zeros(1, jnp.uint32), es[:-1]])
    aggs = {
        "count": jnp.where(live_g, ec - prev_c, 0),
        "sum": jnp.where(live_g, es - prev_s, 0),
        "min": jnp.where(live_g, emin, U32_MAX),
        "max": jnp.where(live_g, emax, 0),
    }
    return reps, aggs, n_groups


def group_aggregate_impl(
    batch: RecordBatch,
    field,
    cfg: EngineConfig = DEFAULT_CONFIG,
    count: jax.Array | None = None,
    active: jax.Array | None = None,
    materialize_reps: bool = True,
) -> tuple[RecordBatch, dict, jax.Array]:
    """Group by `field`; aggregate `num` per group.

    Returns (group_rep_batch, aggs, n_groups): group representative rows (the
    first record of each group, sorted key order) compacted to the front;
    aggs = {"count","sum","min","max"} arrays aligned with those rows.
    `count` marks live rows (static-capacity convention).
    """
    n = batch.nrows
    if count is not None:
        live = jnp.arange(n, dtype=jnp.int32) < count
        # active and count COMPOSE: a predicate mask must still exclude
        # capacity-padding rows past the live count (r4 review: passing
        # both silently dropped count)
        active = live if active is None else active & live
    pre = ()
    extra0 = ()
    if active is not None:
        act0 = active
        pre = ((~act0).astype(jnp.uint32),)
        extra0 = (act0.astype(jnp.uint32),)
    # carry num (the aggregated measure) through the key sort as payload:
    # no record materialization needed for the aggregates themselves
    view = sort_keys(
        batch, field, cfg, pre_words=pre, extra=extra0 + (batch.num,),
        pre_is_mask=True,
    )
    active_s = (
        jnp.ones(n, dtype=bool) if not extra0 else view.extras[0] == 1
    )
    num = view.extras[-1]
    ones = jnp.ones(n, dtype=jnp.int32)
    return _run_aggregates(
        batch, view, active_s, ones, num, num, num, cfg, materialize_reps
    )


group_aggregate = per_static_jit(
    group_aggregate_impl, static_names=("field", "cfg", "materialize_reps")
)


def combine_group_aggregate_impl(
    batch: RecordBatch,
    field,
    partials: tuple,
    cfg: EngineConfig = DEFAULT_CONFIG,
    count: jax.Array | None = None,
    materialize_reps: bool = True,
) -> tuple[RecordBatch, dict, jax.Array]:
    """Merge PARTIAL per-key aggregates into global ones (two-phase
    aggregation's combine step).

    ``partials`` = (count, sum, min, max) u32 columns aligned with `batch`
    rows, each row a group representative from some chip's local
    ``group_aggregate``.  After a hash shuffle every key's partials are
    colocated (<= 1 per source chip), so the combine is one key sort
    carrying the 4 partial words + segmented reductions — the TPU-native
    form of the classic local/global aggregate split, which also bounds the
    shuffle under key skew (any key moves at most ndev partial rows, never
    its raw duplicates).

    Returns (group_rep_batch, aggs, n_groups) exactly like
    ``group_aggregate_impl``.
    """
    n = batch.nrows
    pc, ps, pmin, pmax = (p.astype(jnp.uint32) for p in partials)
    active = (
        jnp.ones(n, dtype=bool)
        if count is None
        else jnp.arange(n, dtype=jnp.int32) < count
    )
    pre = ((~active).astype(jnp.uint32),)
    view = sort_keys(
        batch, field, cfg,
        pre_words=pre,
        extra=(active.astype(jnp.uint32), pc, ps, pmin, pmax),
        pre_is_mask=True,
    )
    s_act, s_pc, s_ps, s_pmin, s_pmax = view.extras
    active_s = s_act == 1
    return _run_aggregates(
        batch, view, active_s, s_pc, s_ps, s_pmin, s_pmax,
        cfg, materialize_reps,
    )
