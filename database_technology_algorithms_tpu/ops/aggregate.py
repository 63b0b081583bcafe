"""Hash aggregate / group-by.

The reference's only aggregate is duplicate elimination (a COUNT-less
group-by, ``DatabaseProject.cpp:94-170``) plus the key-set collapse inside
HashJoin's build phase (``:510-548``).  BASELINE.json's north star asks for a
real masked aggregate kernel, so this module generalizes both: group rows by
the join field and compute count / sum / min / max over ``num`` per group,
via sort + segmented scatter-reduce (the TPU-friendly form of a hash
aggregate — deterministic, collision-free, and exact for string keys).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..batch import RecordBatch
from ..config import DEFAULT_CONFIG, EngineConfig
from .filter import compact
from .keys import adjacent_equal
from .sort import sort_batch_impl

U32_MAX = jnp.uint32(0xFFFFFFFF)


def group_aggregate_impl(
    batch: RecordBatch,
    field,
    cfg: EngineConfig = DEFAULT_CONFIG,
    count: jax.Array | None = None,
) -> tuple[RecordBatch, dict, jax.Array]:
    """Group by `field`; aggregate `num` per group.

    Returns (group_rep_batch, aggs, n_groups): group representative rows (the
    first record of each group, sorted key order) compacted to the front;
    aggs = {"count","sum","min","max"} int arrays aligned with those rows.
    `count` marks live rows (static-capacity convention).
    """
    n = batch.nrows
    sorted_b, _ = sort_batch_impl(batch, field, cfg, count=count)
    active = (
        jnp.ones(n, dtype=bool)
        if count is None
        else jnp.arange(n, dtype=jnp.int32) < count
    )
    new_run = active & ~adjacent_equal(sorted_b, field)
    seg = jnp.cumsum(new_run.astype(jnp.int32)) - 1
    act = active.astype(jnp.int32)

    count_agg = jnp.zeros(n, dtype=jnp.int32).at[seg].add(act)
    ssum = jnp.zeros(n, dtype=jnp.uint32).at[seg].add(
        jnp.where(active, sorted_b.num, 0)
    )
    smin = jnp.full(n, U32_MAX, dtype=jnp.uint32).at[seg].min(
        jnp.where(active, sorted_b.num, U32_MAX)
    )
    smax = jnp.zeros(n, dtype=jnp.uint32).at[seg].max(
        jnp.where(active, sorted_b.num, 0)
    )
    count = count_agg

    reps, n_groups = compact(sorted_b, new_run)
    # aggregates are already indexed by segment id == compacted position
    aggs = {"count": count, "sum": ssum, "min": smin, "max": smax}
    return reps, aggs, n_groups


from ._jit import per_static_jit

group_aggregate = per_static_jit(group_aggregate_impl)
