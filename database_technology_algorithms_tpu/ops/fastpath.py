"""u32-key fast paths: single-word keys (recid / num) skip payload movement.

The generic operators are exact for every key domain but move full 137-byte
records through each sort/compact stage.  For the single-word integer key
domains ('0' recid, '1' num — the reference's benchmark field, main.cpp:114)
the same semantics need only key-width traffic:

* distinct: sort (inactive, key, row) words only; survivors found on the
  sorted key stream; ONE fused full-record gather materializes the output
  (take with zero-fill for padding) — vs sort-gather + compact-scatter.
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
    # survivor indices to the front via a word sort — the engine's design
    # rules ban scatters and flat cumsums on hot paths (movement.py,
    # scan.py; the original .at[].set form predated them — r4 review)
    from .movement import compact_words

    nunique, (orig,) = compact_words(keep, (s_idx,))
    gather_idx = jnp.where(idx < nunique, orig, jnp.int32(n))
    return batch.take_fill(gather_idx), nunique


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
