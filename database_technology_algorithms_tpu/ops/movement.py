"""Sort-based data movement: the TPU's fast path for every permute/compact.

Measured on the target chip (tools/profile_ops.py, 1M rows):

    lax.sort of u32 keys            0.10 ms
    random gather, any row width   ~32 ms   (latency-bound per row)
    scatter compaction             ~59 ms

i.e. XLA's TPU sort runs ~300x faster than a single permutation gather.  So
this engine never materializes a permutation: **records ride through the
sort as payload operands** (35 u32 words: recid, num, valid, 32 string
words), and compaction is "sort by (dropped, original-index)" — a stable
two-bucket partition at sort speed.  This module is the only place the
engine moves rows; everything above (sort/distinct/join/aggregate) is
elementwise logic between sorts.

This inverts the reference's design point — qsort was its *bottleneck*
(140-byte record swaps, SURVEY.md §3.2 hot loop #1) — and also inverts the
GPU-era radix-sort orthodoxy the north star assumed: on this hardware the
compiler's sort IS the bandwidth-optimal mover, and the "histogram/scatter"
plan would run 300x slower through HBM scatters.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..batch import RecordBatch


def sort_rows(
    key_words: list[jax.Array],
    batch: RecordBatch,
    extra: tuple[jax.Array, ...] = (),
    stable_iota: bool = True,
) -> tuple[RecordBatch, tuple[jax.Array, ...]]:
    """Sort rows by key_words, carrying the full record + extras as payload.

    Appends the row index as the final key when stable_iota (deterministic
    total order).  Returns (sorted_batch, sorted_extras).
    """
    n = batch.nrows
    keys = [w.astype(jnp.uint32) for w in key_words]
    if stable_iota:
        keys = keys + [jnp.arange(n, dtype=jnp.int32)]
    payload = batch.payload_words() + [e for e in extra]
    out = jax.lax.sort(tuple(keys) + tuple(payload), num_keys=len(keys))
    pay = out[len(keys):]
    nb = len(batch.payload_words())
    sorted_batch = RecordBatch.from_payload_words(list(pay[:nb]))
    return sorted_batch, tuple(pay[nb:])


def compact_rows(
    batch: RecordBatch,
    keep: jax.Array,
    extra: tuple[jax.Array, ...] = (),
) -> tuple[RecordBatch, jax.Array, tuple[jax.Array, ...]]:
    """Keep-masked rows to the front, order preserved, at sort speed.

    Returns (batch, count, extras).  Dropped rows end up at the tail with
    their original contents (callers treat rows past `count` as padding).
    """
    n = batch.nrows
    drop_w = (~keep).astype(jnp.uint32)
    out_batch, out_extra = sort_rows([drop_w], batch, extra=extra)
    count = jnp.sum(keep, dtype=jnp.int32)
    return out_batch, count, out_extra


def sort_words(
    key_words: list[jax.Array],
    payload: tuple[jax.Array, ...] = (),
    stable_iota: bool = True,
) -> tuple[tuple[jax.Array, ...], tuple[jax.Array, ...]]:
    """Key-only variant: sort key_words carrying arbitrary u32/i32 payload.

    Returns (sorted_keys, sorted_payload) — no record columns involved.
    """
    n = key_words[0].shape[0]
    keys = [w.astype(jnp.uint32) for w in key_words]
    if stable_iota:
        keys = keys + [jnp.arange(n, dtype=jnp.int32)]
    out = jax.lax.sort(tuple(keys) + tuple(payload), num_keys=len(keys))
    nk = len(key_words)  # exclude the iota from returned keys
    return tuple(out[:nk]), tuple(out[len(keys):])


def compact_words(
    keep: jax.Array, payload: tuple[jax.Array, ...]
) -> tuple[jax.Array, tuple[jax.Array, ...]]:
    """Word-level compaction: payload rows with keep=True to the front."""
    drop_w = (~keep).astype(jnp.uint32)
    _, out = sort_words([drop_w], payload)
    return jnp.sum(keep, dtype=jnp.int32), out
