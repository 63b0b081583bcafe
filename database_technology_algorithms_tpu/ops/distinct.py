"""Duplicate elimination (sort-based DISTINCT on the join field).

Reference semantics (``DatabaseProject.cpp:94-170``): sort by the field, then
stream once keeping a record only when its key differs from the previous
record's — i.e. keep the *first* record of each equal-key group, survivors in
sorted key order.  ``nunique`` counts all unique keys.

Vectorized here as two payload-carrying sorts (ops/movement.py): key-sort →
adjacent-equality keep mask → compaction-by-sort.  No gathers or scatters
anywhere.  Two reference bugs are deliberately *not* reproduced
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
from .sort import sort_batch_impl


def distinct_sorted(
    sorted_batch: RecordBatch, field, count: jax.Array | None = None
) -> tuple[RecordBatch, jax.Array]:
    """DISTINCT over an already key-sorted batch. Returns (batch, nunique).

    With `count`, rows past it are padding (already sorted to the tail by
    sort_batch) and are never kept.
    """
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
) -> tuple[RecordBatch, jax.Array]:
    """Sort + DISTINCT (the reference's EliminateDuplicates pipeline).

    Returns (batch_with_capacity_N, nunique); rows past nunique are padding.
    Output rows are in sorted key order, matching the reference's output
    order.  `count` marks live rows under the static-capacity convention.
    """
    sorted_batch, _ = sort_batch_impl(batch, field, cfg, count=count)
    return distinct_sorted(sorted_batch, field, count=count)


distinct = per_static_jit(distinct_impl)
