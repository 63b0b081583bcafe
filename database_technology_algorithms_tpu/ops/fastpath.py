"""u32-key fast paths: single-word keys (recid / num) skip payload movement.

The generic operators are exact for every key domain but move full 137-byte
records through each sort/compact stage.  For the single-word integer key
domains ('0' recid, '1' num — the reference's benchmark field, main.cpp:114)
the same semantics need only key-width traffic:

* distinct: sort (inactive, key, row) words only; survivors found on the
  sorted key stream; ONE fused full-record gather materializes the output
  (take with zero-fill for padding) — vs sort-gather + compact-scatter.
* sorted-intersection join: both inputs are key-sorted with unique live
  prefixes (the distinct outputs), so membership is a searchsorted probe —
  no 2(R+S)-row concat sort at all.
* hash join: build collapses to (sorted unique keys, counts) on the key
  column; probes are a searchsorted + one count gather per row.  This is
  the vectorized analogue of the reference's hash-table probe loop
  (DatabaseProject.cpp:583-629) with the table replaced by a sorted key
  array (binary-search probes are gather-only, which TPUs do well; an
  open-addressing Pallas table is the alternative path in hash_table.py).

All functions preserve the static-capacity + live-count convention and are
exact (padding uses a (inactive, key) compound sort word, never sentinels,
so 0xFFFFFFFF keys stay correct).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..batch import FIELD_NUM, FIELD_RECID, RecordBatch, canonical_field

U32_MAX = np.uint32(0xFFFFFFFF)


def is_u32_field(field) -> bool:
    return canonical_field(field) in (FIELD_RECID, FIELD_NUM)


def u32_key(batch: RecordBatch, field) -> jax.Array:
    return batch.recid if canonical_field(field) == FIELD_RECID else batch.num


def masked_sorted_key(key_sorted_live: jax.Array, count: jax.Array) -> jax.Array:
    """Replace the dead tail with U32_MAX so the whole array is monotone.

    Safe for searchsorted because matches are additionally gated on
    ``pos < count`` (a live U32_MAX key sits at position count-1 and still
    matches; padding never does).
    """
    n = key_sorted_live.shape[0]
    return jnp.where(jnp.arange(n) < count, key_sorted_live, U32_MAX)


def distinct_u32(
    batch: RecordBatch, field, count: jax.Array | None = None
) -> tuple[RecordBatch, jax.Array]:
    """DISTINCT for u32 fields with a single fused payload gather."""
    n = batch.nrows
    key = u32_key(batch, field)
    idx = jnp.arange(n, dtype=jnp.int32)
    if count is None:
        inactive = jnp.zeros(n, dtype=jnp.uint32)
    else:
        inactive = (idx >= count).astype(jnp.uint32)
    s_inact, s_key, s_idx = jax.lax.sort((inactive, key, idx), num_keys=3)
    active_sorted = s_inact == 0
    first = jnp.concatenate([jnp.ones(1, bool), s_key[1:] != s_key[:-1]])
    keep = active_sorted & first
    nunique = jnp.sum(keep, dtype=jnp.int32)
    dest = jnp.cumsum(keep.astype(jnp.int32)) - 1
    gather_idx = jnp.full(n, n, dtype=jnp.int32).at[
        jnp.where(keep, dest, n)
    ].set(s_idx, mode="drop")
    return batch.take_fill(gather_idx), nunique


def intersect_sorted_unique_u32(
    r: RecordBatch,
    r_count: jax.Array,
    s: RecordBatch,
    s_count: jax.Array,
    field,
) -> tuple[RecordBatch, jax.Array]:
    """R rows whose key appears in S; both inputs key-sorted-unique prefixes.

    Replaces the concat-sort intersection with one searchsorted probe.
    Output: matched R rows compacted to the front via one fused gather.
    """
    nr = r.nrows
    r_key = u32_key(r, field)
    s_key = masked_sorted_key(u32_key(s, field), s_count)
    idx = jnp.arange(nr, dtype=jnp.int32)
    pos = jnp.searchsorted(s_key, r_key)
    hit = (pos < s_count) & (jnp.take(s_key, pos, mode="clip") == r_key)
    matched = hit & (idx < r_count)
    nres = jnp.sum(matched, dtype=jnp.int32)
    dest = jnp.cumsum(matched.astype(jnp.int32)) - 1
    gather_idx = jnp.full(nr, nr, dtype=jnp.int32).at[
        jnp.where(matched, dest, nr)
    ].set(idx, mode="drop")
    return r.take_fill(gather_idx), nres


def hash_join_count_u32(
    build: RecordBatch,
    probe: RecordBatch,
    field,
    build_count: jax.Array | None = None,
    probe_count: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """(matched, mult, nres) for u32 fields — key-column traffic only."""
    nb = build.nrows
    npr = probe.nrows
    bkey = u32_key(build, field)
    bidx = jnp.arange(nb, dtype=jnp.int32)
    if build_count is None:
        b_inact = jnp.zeros(nb, dtype=jnp.uint32)
        build_count = jnp.int32(nb)
    else:
        b_inact = (bidx >= build_count).astype(jnp.uint32)
    s_inact, s_key = jax.lax.sort((b_inact, bkey), num_keys=2)
    # live build keys sorted at the front; dead tail forced to U32_MAX with
    # matches gated on pos < build_count (no sentinel ambiguity)
    skey_masked = masked_sorted_key(s_key, build_count)

    pkey = u32_key(probe, field)
    pos = jnp.searchsorted(skey_masked, pkey)
    hit = (pos < build_count) & (jnp.take(skey_masked, pos, mode="clip") == pkey)
    if probe_count is not None:
        hit = hit & (jnp.arange(npr, dtype=jnp.int32) < probe_count)
    # fields 0/1: the reference map collapses the build side to a key set,
    # so per-probe multiplicity is exactly 1 on a hit
    mult = hit.astype(jnp.int32)
    return hit, mult, jnp.sum(mult)
