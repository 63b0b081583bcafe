"""Vectorized total-order sort over record batches.

Replaces the reference's external merge sort machinery — qsort run formation
(``DatabaseProject.cpp:207-214``) and the priority-queue k-way merge
(``DatabaseProject.cpp:255,303-326``), both per-record scalar hot loops —
with one ``lax.sort`` over columnar key words **carrying the full record as
payload operands** (ops/movement.py): on the target TPU that runs at
~memory speed, while materializing a permutation and gathering would cost
~300x more (measured; see movement.py).

Determinism: the reference's qsort is unstable, so its tie order (and which
record survives a later dedup) is unspecified.  Here the row index is always
appended as the final key word, making every sort a *total* order —
deterministic across runs, chips, and mesh shapes (SURVEY.md §7 hard part #6).

String fast path: sort by a ``str_prefix_words``-word prefix; detect
prefix-equal-but-key-unequal adjacencies post-sort and fall back to the
exact 32-word sort only then (generator data: 5-char strings ⇒ the 2-word
prefix is always exact).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..batch import RecordBatch, canonical_field
from ..config import DEFAULT_CONFIG, EngineConfig
from ._jit import per_static_jit
from .keys import STR_WORDS, adjacent_equal, key_words, uses_strings
from .movement import sort_rows


def sort_batch_extended(
    batch: RecordBatch,
    field,
    cfg: EngineConfig = DEFAULT_CONFIG,
    pre_words: tuple = (),
    post_words: tuple = (),
    extra: tuple = (),
) -> tuple[RecordBatch, tuple]:
    """Sort rows by pre_words ++ field-key ++ post_words (exact), carrying
    the record payload and `extra` word arrays through the sort.

    The join/distinct drivers thread control words through here (an
    "inactive row" word to sink padding rows, a "side" word for build-
    before-probe tie order) while reusing one string fast-path/fallback.

    Fallback trigger: an adjacent pair (in fast order) equal on all
    pre+prefix+post sort words but with unequal full keys proves the prefix
    under-resolved some group, so rerun at full width.  Equal-sort-word runs
    are contiguous, so adjacency checking is sufficient.
    """
    field = canonical_field(field)
    pre = [w.astype(jnp.uint32) for w in pre_words]
    post = [w.astype(jnp.uint32) for w in post_words]
    extra = tuple(extra)

    if not uses_strings(field):
        return sort_rows(pre + key_words(batch, field) + post, batch, extra=extra)

    pw = min(cfg.str_prefix_words, STR_WORDS)
    if pw >= STR_WORDS:
        return sort_rows(
            pre + key_words(batch, field, None) + post, batch, extra=extra
        )

    # carry the control words as extra payload so the tie check can see them
    # in sorted order without any gathers
    ctl = tuple(pre) + tuple(post)
    sorted_fast, fast_extra = sort_rows(
        pre + key_words(batch, field, pw) + post, batch, extra=extra + ctl
    )
    n = batch.nrows
    sorted_ctl = fast_extra[len(extra):]
    pref_eq = jnp.ones(n - 1, dtype=bool)
    for w in sorted_ctl:
        pref_eq &= w[1:] == w[:-1]
    for w in key_words(sorted_fast, field, pw):
        pref_eq &= w[1:] == w[:-1]
    full_eq = adjacent_equal(sorted_fast, field)[1:]
    needs_full = jnp.any(pref_eq & ~full_eq)

    def full_path(_):
        return sort_rows(
            pre + key_words(batch, field, None) + post, batch, extra=extra
        )

    def fast_path(_):
        return sorted_fast, fast_extra[: len(extra)]

    return jax.lax.cond(needs_full, full_path, fast_path, None)


def sort_batch_impl(
    batch: RecordBatch,
    field,
    cfg: EngineConfig = DEFAULT_CONFIG,
    count: jax.Array | None = None,
) -> tuple[RecordBatch, jax.Array]:
    """Sort a batch by `field`. Returns (sorted_batch, perm). Jit-safe.

    Exact for all four key domains (string fallback included).  With `count`,
    only the first `count` rows are live: they sort to the front and padding
    sinks to the tail regardless of its (zeroed) keys — the static-capacity
    convention.  `perm` (the original index of each output row) is carried
    as payload, costing nothing extra.
    """
    field = canonical_field(field)
    n = batch.nrows
    if n <= 1:
        return batch, jnp.arange(n, dtype=jnp.int32)
    pre = ()
    if count is not None:
        inactive = (jnp.arange(n, dtype=jnp.int32) >= count).astype(jnp.uint32)
        pre = (inactive,)
    iota = jnp.arange(n, dtype=jnp.int32)
    sorted_b, (perm,) = sort_batch_extended(
        batch, field, cfg, pre_words=pre, extra=(iota,)
    )
    return sorted_b, perm


sort_batch = per_static_jit(sort_batch_impl)


def sort_perm(batch: RecordBatch, field, cfg: EngineConfig = DEFAULT_CONFIG) -> jax.Array:
    """Permutation-only helper (still exact for strings)."""
    return sort_batch_impl(batch, field, cfg)[1]


def is_sorted(batch: RecordBatch, field, cfg: EngineConfig = DEFAULT_CONFIG) -> jax.Array:
    """bool scalar: batch rows are in non-decreasing key order (full width)."""
    words = key_words(batch, field, None)
    n = batch.nrows
    if n <= 1:
        return jnp.bool_(True)
    # lexicographic non-decreasing: at each adjacency, the first differing
    # word must increase.
    lt = jnp.zeros(n - 1, dtype=bool)  # strictly less at first difference
    eq = jnp.ones(n - 1, dtype=bool)
    for w in words:
        lt = lt | (eq & (w[:-1] < w[1:]))
        eq = eq & (w[:-1] == w[1:])
    return jnp.all(lt | eq)
