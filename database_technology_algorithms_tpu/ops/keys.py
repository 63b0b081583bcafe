"""Sort/join key extraction for the four reference key domains.

The reference parameterizes every operator by a field selector
(``dbtproj.h:46``): '0'=recid, '1'=num, '2'=str (strcmp order),
'3'=(num, str) lexicographic — comparators at
``/root/reference/DatabaseProject.cpp:44-92``.

Here a key is a list of **uint32 words, most-significant first**, and record
batches already store strings as big-endian packed words
(``batch.RecordBatch.strw``), so key extraction is pure slicing:

* recid / num are u32 — one word.
* str: word-lexicographic order == bytewise unsigned order == strcmp order
  (C11 7.24.4; NUL-normalization at ingest zeroes post-terminator garbage).
* (num, str) = [num] ++ str words.

Fast path: only ``prefix_words`` string words (default 2 = first 8 chars)
participate in a sort; a vectorized post-check detects prefix-ties whose
full strings differ and triggers the exact 32-word fallback (SURVEY.md §7
hard part #2).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..batch import (
    FIELD_NUM,
    FIELD_NUMSTR,
    FIELD_RECID,
    FIELD_STR,
    STR_WORDS,
    RecordBatch,
    canonical_field,
)


def str_key_words(strw: jax.Array, nwords: int) -> list[jax.Array]:
    """First nwords packed string words (most-significant first)."""
    return [strw[:, j] for j in range(nwords)]


def key_words(batch: RecordBatch, field, nwords: int | None = None) -> list[jax.Array]:
    """Key word list for `field`. nwords limits string words (None = exact).

    The batch's static width caps the list either way: words beyond it are
    zero by the narrow-width invariant, so omitting them is exact.
    """
    field = canonical_field(field)
    if field == FIELD_RECID:
        return [batch.recid]
    if field == FIELD_NUM:
        return [batch.num]
    sw = batch.str_words if nwords is None else min(nwords, batch.str_words)
    if field == FIELD_STR:
        return str_key_words(batch.strw, sw)
    if field == FIELD_NUMSTR:
        return [batch.num] + str_key_words(batch.strw, sw)
    raise ValueError(field)


def uses_strings(field) -> bool:
    return canonical_field(field) in (FIELD_STR, FIELD_NUMSTR)


def rows_equal_on_field(batch: RecordBatch, field, i: jax.Array, j: jax.Array) -> jax.Array:
    """Exact key equality between row sets i and j (full-width, never prefixed)."""
    field = canonical_field(field)
    if field == FIELD_RECID:
        return batch.recid[i] == batch.recid[j]
    if field == FIELD_NUM:
        return batch.num[i] == batch.num[j]
    streq = jnp.all(batch.strw[i] == batch.strw[j], axis=-1)
    if field == FIELD_STR:
        return streq
    return streq & (batch.num[i] == batch.num[j])


def adjacent_equal(batch: RecordBatch, field) -> jax.Array:
    """bool[N]: row k has the same full key as row k-1 (element 0 is False).

    The vectorized heir of the reference's ``previous``-record compare in
    EliminateDuplicates (``DatabaseProject.cpp:117-144``) — and, unlike it,
    element 0 is well-defined rather than a compare against uninitialized
    stack memory.
    """
    field = canonical_field(field)
    n = batch.nrows
    if n == 0:
        return jnp.zeros((0,), dtype=bool)
    if field == FIELD_RECID:
        eq = batch.recid[1:] == batch.recid[:-1]
    elif field == FIELD_NUM:
        eq = batch.num[1:] == batch.num[:-1]
    else:
        eq = jnp.all(batch.strw[1:] == batch.strw[:-1], axis=-1)
        if field == FIELD_NUMSTR:
            eq = eq & (batch.num[1:] == batch.num[:-1])
    return jnp.concatenate([jnp.zeros((1,), dtype=bool), eq])


# ---- hashing ---------------------------------------------------------------

_FNV_PRIME = np.uint32(16777619)
_FNV_BASIS = np.uint32(2166136261)


def hash_words(
    words: list[jax.Array], seed: int = 0, skip_zero_from: int | None = None
) -> jax.Array:
    """FNV-1a-style u32 hash over key words, with a final avalanche mix.

    Used by the hash join and the hash-partitioned shuffle.  Deterministic
    across chips (pure integer ops) so partitioning is reproducible.

    ``skip_zero_from=k`` makes the hash **storage-width invariant** for
    NUL-normalized STRING words at indices >= k: among those words a
    fully-zero word can only occur after the terminator (mid-string words
    always contain a nonzero byte), so zero words are exactly the trailing
    padding and skipping them yields the same hash whether a key is stored
    in 2 or 32 words.  Required whenever the two sides of a join may carry
    different static widths.  Words BEFORE index k (e.g. the num plane of
    field '3', where 0 is a legal value) are always hashed; ``None``
    disables skipping entirely.
    """
    h = _FNV_BASIS ^ jnp.uint32(seed * 0x9E3779B9)
    for i, w in enumerate(words):
        w = w.astype(jnp.uint32)
        hw = (h ^ (w & 0xFF)) * _FNV_PRIME
        hw = (hw ^ ((w >> 8) & 0xFF)) * _FNV_PRIME
        hw = (hw ^ ((w >> 16) & 0xFF)) * _FNV_PRIME
        hw = (hw ^ (w >> 24)) * _FNV_PRIME
        skip = skip_zero_from is not None and i >= skip_zero_from
        h = jnp.where(w == 0, h, hw) if skip else hw
    # murmur3 finalizer for avalanche
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    return h


def key_hash(batch: RecordBatch, field, seed: int = 0) -> jax.Array:
    """u32 hash of each row's full key, invariant to the stored strw width."""
    field = canonical_field(field)
    # width invariance only applies to the string planes; field '3' leads
    # with the num word, where 0 is a legal key value and must always hash
    skip = (1 if field == FIELD_NUMSTR else 0) if uses_strings(field) else None
    return hash_words(key_words(batch, field, nwords=None), seed=seed,
                      skip_zero_from=skip)
