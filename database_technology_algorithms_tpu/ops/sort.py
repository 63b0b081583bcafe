"""Vectorized total-order sort over record batches.

Replaces the reference's external merge sort machinery — qsort run formation
(``DatabaseProject.cpp:207-214``) and the priority-queue k-way merge
(``DatabaseProject.cpp:255,303-326``), both per-record scalar hot loops — with
a single data-parallel sort over columnar keys.  On TPU the default engine is
``jax.lax.sort`` over the key-word list (an XLA sorting network, entirely
HBM/VMEM resident); ``radix_sort.py`` provides the Pallas LSD-radix
alternative for u32 keys and the dispatcher here picks per dtype/width.

Determinism: the reference's qsort is unstable, so its tie order (and which
record survives a later dedup) is unspecified.  Here the row index is always
appended as the final key word, making every sort a *total* order —
deterministic across runs, chips, and mesh shapes (SURVEY.md §7 hard part #6).

String fast path: sort by a ``str_prefix_words``-word prefix; detect
prefix-equal-but-key-unequal adjacencies post-sort and fall back to the exact
32-word sort only then (generator data: 5-char strings ⇒ the 2-word prefix is
always exact).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..batch import RecordBatch, canonical_field
from ..config import DEFAULT_CONFIG, EngineConfig
from .keys import STR_WORDS, key_words, rows_equal_on_field, uses_strings


def perm_from_words(words: list[jax.Array]) -> jax.Array:
    """Sort permutation (int32[N]) ordering rows by the key-word list.

    Appends the row index as the least-significant key => unique total order,
    so an unstable sort yields a deterministic, effectively-stable result.
    """
    n = words[0].shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    out = jax.lax.sort(tuple(words) + (iota,), num_keys=len(words) + 1)
    return out[-1]


def sort_perm_extended(
    batch: RecordBatch,
    field,
    cfg: EngineConfig = DEFAULT_CONFIG,
    pre_words: tuple = (),
    post_words: tuple = (),
) -> jax.Array:
    """Permutation sorting by pre_words ++ field-key ++ post_words (exact).

    The join/distinct drivers thread control words through here (e.g. an
    "inactive row" word to sink padding rows, a "side" word for R-before-S
    tie order) while reusing one string fast-path/fallback implementation.

    Fallback trigger: an adjacent pair (in fast order) equal on all pre+prefix
    words but with unequal full keys proves the prefix under-resolves some
    group, so rerun with all 32 string words.  Equal-on-pre+prefix runs are
    contiguous, so checking adjacent pairs is sufficient.
    """
    field = canonical_field(field)
    pre = [w.astype(jnp.uint32) for w in pre_words]
    post = [w.astype(jnp.uint32) for w in post_words]

    if not uses_strings(field):
        return perm_from_words(pre + key_words(batch, field) + post)

    pw = min(cfg.str_prefix_words, STR_WORDS)
    if pw >= STR_WORDS:
        return perm_from_words(pre + key_words(batch, field, None) + post)

    prefix = key_words(batch, field, pw)
    perm_fast = perm_from_words(pre + prefix + post)

    check_words = pre + prefix
    lo, hi = perm_fast[:-1], perm_fast[1:]
    pref_eq = jnp.ones(batch.nrows - 1, dtype=bool)
    for w in check_words:
        pref_eq &= w[lo] == w[hi]
    full_eq = rows_equal_on_field(batch, field, lo, hi)
    needs_full = jnp.any(pref_eq & ~full_eq)

    def full_path(_):
        return perm_from_words(pre + key_words(batch, field, None) + post)

    def fast_path(_):
        return perm_fast

    return jax.lax.cond(needs_full, full_path, fast_path, None)


def sort_batch_impl(
    batch: RecordBatch,
    field,
    cfg: EngineConfig = DEFAULT_CONFIG,
    count: jax.Array | None = None,
) -> tuple[RecordBatch, jax.Array]:
    """Sort a batch by `field`. Returns (sorted_batch, perm). Jit-safe.

    Exact for all four key domains (string fallback included).  With `count`,
    only the first `count` rows are live: they are sorted to the front and
    padding rows sink to the tail regardless of their (zeroed) keys — the
    static-capacity convention used by the distributed operators.
    """
    field = canonical_field(field)
    n = batch.nrows
    if n <= 1:
        return batch, jnp.arange(n, dtype=jnp.int32)
    pre = ()
    if count is not None:
        inactive = (jnp.arange(n, dtype=jnp.int32) >= count).astype(jnp.uint32)
        pre = (inactive,)
    perm = sort_perm_extended(batch, field, cfg, pre_words=pre)
    return batch.take(perm), perm


from ._jit import per_static_jit

sort_batch = per_static_jit(sort_batch_impl)


def sort_perm(batch: RecordBatch, field, cfg: EngineConfig = DEFAULT_CONFIG) -> jax.Array:
    return sort_perm_extended(batch, field, cfg)


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
