"""Masked selection filter + compaction.

The reference's data model carries a ``valid`` flag on every record/block
(``dbtproj.h:24,35``) as its selection mechanism, but no operator ever tests
it (SURVEY.md §2 C8) — predicate evaluation is trivially "all pass".  Here the
filter is real: predicates evaluate to a boolean mask on the VPU, and
`compact` turns (rows, mask) into a dense prefix via one cumsum + one scatter,
the static-shape-friendly TPU form of "copy the surviving records forward".

Static shapes: under jit, output capacity equals input capacity; the true row
count rides alongside as a scalar (SURVEY.md §7 hard part #4).  Rows past the
count are zeroed.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..batch import STR_PAD, RecordBatch
from ..config import DEFAULT_CONFIG, EngineConfig
from .movement import compact_rows


def compact(
    batch: RecordBatch,
    mask: jax.Array,
    cfg: EngineConfig = DEFAULT_CONFIG,
    count: jax.Array | None = None,
) -> tuple[RecordBatch, jax.Array]:
    """Move rows where mask is True to the front, preserving order.

    Returns (batch_same_capacity, count); rows past `count` are zeroed.
    With ``count``, only the first ``count`` input rows are live — zeroed
    capacity-padding rows can otherwise satisfy a predicate (num=0,
    str='') and be emitted as garbage survivors (r4 review).
    TPU: grouped payload-placement sorts; gather backends: one word sort +
    one fused record gather (see ops/movement.py for the measured rationale).
    """
    if count is not None:
        mask = mask & (jnp.arange(batch.nrows, dtype=jnp.int32) < count)
    out, cnt, _ = compact_rows(batch, mask, cfg=cfg)
    return out, cnt


def truncate(batch: RecordBatch, count) -> RecordBatch:
    """Host-side: materialize only the first `count` rows (not jit-safe)."""
    c = int(count)
    return RecordBatch(
        recid=batch.recid[:c],
        num=batch.num[:c],
        strw=batch.strw[:c],
        valid=batch.valid[:c],
    )


# ---- predicates ------------------------------------------------------------

Predicate = Callable[[RecordBatch], jax.Array]


def pred_valid() -> Predicate:
    """The reference-format selection predicate: record.valid is set."""
    return lambda b: b.valid


def pred_num_range(lo: int | None = None, hi: int | None = None) -> Predicate:
    def f(b: RecordBatch) -> jax.Array:
        m = jnp.ones(b.nrows, dtype=bool)
        if lo is not None:
            m &= b.num >= jnp.uint32(lo)
        if hi is not None:
            m &= b.num < jnp.uint32(hi)
        return m

    return f


def pred_recid_range(lo: int | None = None, hi: int | None = None) -> Predicate:
    def f(b: RecordBatch) -> jax.Array:
        m = jnp.ones(b.nrows, dtype=bool)
        if lo is not None:
            m &= b.recid >= jnp.uint32(lo)
        if hi is not None:
            m &= b.recid < jnp.uint32(hi)
        return m

    return f


def pred_str_eq(s: bytes) -> Predicate:
    """String equality (strcmp == 0 semantics on NUL-normalized bytes)."""
    from ..batch import normalize_str_bytes, pack_str_bytes

    const = np.zeros((1, STR_PAD), dtype=np.uint8)
    raw = np.frombuffer(s[:STR_PAD], dtype=np.uint8)
    const[0, : len(raw)] = raw
    # the constant gets the same NUL-normalization as ingested strings:
    # bytes after an embedded NUL are strcmp-invisible, and stored rows
    # have zeros there (r4 review: b'Hola\\x00xyz' matched nothing)
    const_w = pack_str_bytes(normalize_str_bytes(const))[0]

    def f(b: RecordBatch) -> jax.Array:
        k = b.str_words
        if np.any(const_w[k:]):
            # the constant extends past the batch's stored width, where
            # every string is zero — nothing can match
            return jnp.zeros(b.nrows, dtype=bool)
        return jnp.all(b.strw == jnp.asarray(const_w[:k]), axis=-1)

    return f


def pred_and(*preds: Predicate) -> Predicate:
    def f(b: RecordBatch) -> jax.Array:
        m = preds[0](b)
        for p in preds[1:]:
            m &= p(b)
        return m

    return f


def filter_batch(
    batch: RecordBatch,
    predicate: Predicate,
    count: jax.Array | None = None,
) -> tuple[RecordBatch, jax.Array]:
    """Evaluate predicate, compact survivors. Returns (batch, count).

    ``count`` marks the live prefix under the static-capacity convention
    (padding rows never pass, whatever the predicate says of zeros)."""
    return compact(batch, predicate(batch), count=count)
