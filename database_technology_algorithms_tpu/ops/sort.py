"""Vectorized total-order sort over record batches (key-word core).

Replaces the reference's external merge sort machinery — qsort run formation
(``DatabaseProject.cpp:207-214``) and the priority-queue k-way merge
(``DatabaseProject.cpp:255,303-326``), both per-record scalar hot loops.

TPU design point (measured on the target chip; r3, PERF_NOTES.md):

    lax.sort, few operands      ~0.5-1 ms / 1M rows (~0.9 ms/operand at 2M)
    random row gather           ~7 ms / 1M rows (all columns consumed)
    lax.sort, 36 operands       compile time explodes (>45 min)

so the engine (a) sorts only *key words + a few control/index words* —
never the record payload — keeping every sort at <=8 operands, and
(b) materializes rows with at most ONE fused gather per operator output
(``take``/``take_fill``).  Operators in between run on sorted key words,
adjacency masks and segmented scans only.

Exact strings: the fast path sorts a ``str_prefix_words`` prefix; a
vectorized check finds prefix-ties whose full keys differ and a
``lax.cond`` falls back to an **LSD stable refinement** — 16 stable
two-word sort passes from least- to most-significant word — which is exact
strcmp order with constant operand count (compile-cheap; runtime cost only
paid when real ties exist).

Determinism: the row index is the final sort key everywhere — a unique
total order, stable across runs, chips, and mesh shapes (SURVEY.md §7 #6).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..batch import RecordBatch, canonical_field
from ..config import DEFAULT_CONFIG, EngineConfig
from ._jit import per_static_jit
from .keys import key_words, rows_equal_on_field, uses_strings


@dataclasses.dataclass
class SortedView:
    """Result of a key sort: no record data moved yet.

    perm[i]   = original row index of the i-th row in sorted order
    adj_eq[i] = sorted row i has the same FULL key as sorted row i-1
                (exact, all 4 key domains; element 0 False)
    extras    = caller words, sorted along
    """

    perm: jax.Array
    adj_eq: jax.Array
    extras: tuple


jax.tree_util.register_dataclass(
    SortedView, data_fields=["perm", "adj_eq", "extras"], meta_fields=[]
)


def _lsd_exact_string_perm(
    batch: RecordBatch, field, pre_words: tuple, post_words: tuple
) -> jax.Array:
    """Exact lexicographic permutation via LSD stable passes.

    Sorts by (pre ++ full key ++ post, original index) using stable
    two-word passes from least to most significant — constant operand
    count per sort instruction, so compile cost stays flat.  Gathers one
    word column per pass step (the rare-path price).
    """
    field = canonical_field(field)
    n = batch.nrows
    perm = jnp.arange(n, dtype=jnp.int32)

    def stable_pass(perm, words):
        ops = tuple(w[perm] for w in words) + (perm,)
        out = jax.lax.sort(ops, num_keys=len(words), is_stable=True)
        return out[-1]

    # least-significant first: post words
    for w in reversed([w.astype(jnp.uint32) for w in post_words]):
        perm = stable_pass(perm, [w])
    # string words (the batch's static width; widths are even), two at a
    # time, from the last pair up
    for j in range(batch.str_words - 2, -2, -2):
        lo = max(j, 0)
        perm = stable_pass(perm, [batch.strw[:, k] for k in range(lo, j + 2)])
    # num word for field 3
    if field == 3:
        perm = stable_pass(perm, [batch.num])
    # most-significant last: pre words
    for w in reversed([w.astype(jnp.uint32) for w in pre_words]):
        perm = stable_pass(perm, [w])
    return perm


def sort_keys(
    batch: RecordBatch,
    field,
    cfg: EngineConfig = DEFAULT_CONFIG,
    pre_words: tuple = (),
    post_words: tuple = (),
    extra: tuple = (),
    pre_is_mask: bool = False,
) -> SortedView:
    """Sort rows by pre_words ++ field-key ++ post_words; exact; no payload.

    The join/distinct drivers thread control words through here (an
    "inactive row" word to sink padding rows, a "side" word for build-
    before-probe tie order).  `extra` words ride as sort payload.

    ``pre_is_mask=True`` declares the single pre word 0/1-valued (an
    inactivity mask): for single-word u32 keys the (mask, key, iota) sort
    then bit-packs into 2 operands (ops/sort.packed_u32_view_sort —
    exact, ~1.25x on the target chip; gated by cfg.packed_u32_sorts).
    """
    field = canonical_field(field)
    n = batch.nrows
    pre = [w.astype(jnp.uint32) for w in pre_words]
    post = [w.astype(jnp.uint32) for w in post_words]
    extra = tuple(extra)
    iota = jnp.arange(n, dtype=jnp.int32)

    def finish(perm, sorted_key_words, extras):
        if sorted_key_words is None:
            eq = rows_equal_on_field(batch, field, perm[:-1], perm[1:])
        else:
            eq = jnp.ones(n - 1, dtype=bool)
            for w in sorted_key_words:
                eq &= w[1:] == w[:-1]
        adj = jnp.concatenate([jnp.zeros(1, bool), eq])
        return SortedView(perm=perm, adj_eq=adj, extras=extras)

    if not uses_strings(field):
        kw = key_words(batch, field)
        if (
            pre_is_mask
            and cfg.packed_u32_sorts
            and len(kw) == 1
            and len(pre) == 1
            and not post
        ):
            s_key, perm, _s_act, extras = packed_u32_view_sort(
                pre[0], kw[0], extra
            )
            eq = s_key[1:] == s_key[:-1]
            adj = jnp.concatenate([jnp.zeros(1, bool), eq])
            return SortedView(perm=perm, adj_eq=adj, extras=extras)
        ops = tuple(pre) + tuple(kw) + tuple(post) + (iota,) + extra
        nk = len(pre) + len(kw) + len(post) + 1
        out = jax.lax.sort(ops, num_keys=nk)
        skw = out[len(pre) : len(pre) + len(kw)]
        return finish(out[nk - 1], skw, tuple(out[nk:]))

    pw = min(cfg.str_prefix_words, batch.str_words)
    prefix = key_words(batch, field, pw)
    ops = tuple(pre) + tuple(prefix) + tuple(post) + (iota,) + extra
    nk = len(pre) + len(prefix) + len(post) + 1
    out = jax.lax.sort(ops, num_keys=nk)
    perm_fast = out[nk - 1]
    fast_extras = tuple(out[nk:])

    # tie check: adjacent pairs equal on every sort word but with unequal
    # full keys prove the prefix under-resolved a group (runs of equal sort
    # words are contiguous, so adjacency suffices)
    sort_words_sorted = out[: nk - 1]
    lo, hi = perm_fast[:-1], perm_fast[1:]
    word_eq = jnp.ones(n - 1, dtype=bool)
    for w in sort_words_sorted:
        word_eq &= w[1:] == w[:-1]
    full_eq_fast = rows_equal_on_field(batch, field, lo, hi)
    needs_full = jnp.any(word_eq & ~full_eq_fast)

    def full_path(_):
        perm = _lsd_exact_string_perm(batch, field, tuple(pre), tuple(post))
        extras_p = tuple(e[perm] for e in extra)
        eq = rows_equal_on_field(batch, field, perm[:-1], perm[1:])
        adj = jnp.concatenate([jnp.zeros(1, bool), eq])
        return SortedView(perm=perm, adj_eq=adj, extras=extras_p)

    def fast_path(_):
        adj = jnp.concatenate([jnp.zeros(1, bool), full_eq_fast])
        return SortedView(perm=perm_fast, adj_eq=adj, extras=fast_extras)

    return jax.lax.cond(needs_full, full_path, fast_path, None)


def packed_u32_view_sort(
    inact: jax.Array, key: jax.Array, extra: tuple = ()
) -> tuple[jax.Array, jax.Array, jax.Array, tuple]:
    """Sort by (inact ∈ {0,1}, u32 key, row index) as a 2-OPERAND sort.

    Bit-packs the three logical sort words into two u32 operands —
        hi = inact<<31 | key>>1        lo = (key&1)<<31 | iota
    whose lexicographic order equals (inact, key, iota) exactly (the
    order was verified element-wise against the 3-operand form;
    tools/bench_sort_ceiling.py).  Measured 4.33 -> 3.46 ms at 2M rows on
    the target chip (~1.25x): lax.sort cost is per-operand, and the
    pipeline pays this sort on every operator.  Requires n < 2^31 —
    guaranteed, device budgets cap far lower.

    Returns (s_key, perm, s_act, extras): ``s_key`` is each sorted row's
    ORIGINAL key even for inactive rows (their hi bit shifts out),
    ``s_act`` the sorted activity mask, ``extra`` words ride as payload.
    """
    n = key.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    hi = (inact.astype(jnp.uint32) << 31) | (key >> 1)
    lo = ((key & 1) << 31) | iota.astype(jnp.uint32)
    out = jax.lax.sort((hi, lo) + tuple(extra), num_keys=2)
    s_hi, s_lo = out[0], out[1]
    s_key = (s_hi << 1) | (s_lo >> 31)
    perm = (s_lo & jnp.uint32(0x7FFFFFFF)).astype(jnp.int32)
    s_act = (s_hi >> 31) == 0
    return s_key, perm, s_act, tuple(out[2:])


def survivor_dest(
    view_perm: jax.Array, keep_sorted: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """(dest, count): each ORIGINAL row's output position under "kept rows,
    in sorted order, to the front; drops after in sorted order".

    keep_sorted is a mask over sorted positions; the result is a dense
    permutation of [0, N) in original row order (one 2-operand un-permute
    sort — view_perm is a permutation, so sorting by it restores original
    order).
    """
    n = view_perm.shape[0]
    count = jnp.sum(keep_sorted, dtype=jnp.int32)
    pos = jnp.arange(n, dtype=jnp.int32)
    from .scan import cumsum as _bcumsum

    rank = _bcumsum(keep_sorted.astype(jnp.int32)) - 1
    dest_sorted = jnp.where(keep_sorted, rank, count + (pos - rank - 1))
    from .movement import sort_words

    _, (dest,) = sort_words(
        [view_perm.astype(jnp.uint32)], (dest_sorted,), stable_iota=False
    )
    return dest, count


def materialize_survivors(
    batch: RecordBatch,
    view_perm: jax.Array,
    keep_sorted: jax.Array,
    cfg: EngineConfig = DEFAULT_CONFIG,
) -> tuple[RecordBatch, jax.Array]:
    """Move kept rows (in sorted order) to the front; rows past count zeroed.

    keep_sorted is a mask over sorted positions.  TPU: destination-keyed
    grouped placement sorts (ops/movement.py); other backends: one fused
    record gather.
    """
    from .movement import permute_rows, use_sort_placement

    n = batch.nrows
    if use_sort_placement(cfg):
        dest, count = survivor_dest(view_perm, keep_sorted)
        return permute_rows(batch, dest, count=count, cfg=cfg), count
    drop_w = (~keep_sorted).astype(jnp.uint32)
    out = jax.lax.sort(
        (drop_w, jnp.arange(n, dtype=jnp.int32), view_perm), num_keys=2
    )
    count = jnp.sum(keep_sorted, dtype=jnp.int32)
    gather_idx = jnp.where(
        jnp.arange(n, dtype=jnp.int32) < count, out[2], jnp.int32(n)
    )
    return batch.take_fill(gather_idx), count


def sort_batch_impl(
    batch: RecordBatch,
    field,
    cfg: EngineConfig = DEFAULT_CONFIG,
    count: jax.Array | None = None,
) -> tuple[RecordBatch, jax.Array]:
    """Sort a batch by `field`. Returns (sorted_batch, perm). Jit-safe.

    Exact for all four key domains.  With `count`, only the first `count`
    rows are live; padding sinks to the tail (static-capacity convention).
    One key sort, then either grouped placement sorts (TPU) or one record
    gather (other backends) to move the payload.
    """
    from .movement import permute_rows, sort_words, use_sort_placement

    from ..utils.checks import ensure_device_budget

    field = canonical_field(field)
    n = batch.nrows
    ensure_device_budget(n, cfg, "sort_batch")
    if n <= 1:
        return batch, jnp.arange(n, dtype=jnp.int32)
    if (
        field in (0, 1)
        and cfg.packed_u32_sorts
        and use_sort_placement(cfg)
        and cfg.materialize != "sort2d"  # the 2-D engine stays selectable
        # 4 + K operands since the key column stopped riding (r5):
        # hi, lo, other-id, K string words, valid
        and 4 + batch.str_words <= 8
    ):
        # u32 keys at narrow width: ONE fused sort carries the whole
        # record — packed 2-word key + payload words — instead of key
        # sort + inverse-perm sort + placement sorts (9 operand-passes
        # -> 4+K, r4/r5).  valid rides as payload: it is not a sort key,
        # and folding it into lo would change the iota tie order.  The
        # key's OWN column does not ride at all: the packed words carry
        # the full key (hi bits 30:0 = key bits 31:1, lo bit 31 = key
        # bit 0), so it is reconstructed after the sort — one fewer
        # operand (r5, the movement.key_plane trick).
        key = batch.recid if field == 0 else batch.num
        other = batch.num if field == 0 else batch.recid
        iota = jnp.arange(n, dtype=jnp.int32)
        inact = (
            jnp.zeros(n, jnp.uint32)
            if count is None
            else (iota >= count).astype(jnp.uint32)
        )
        hi = (inact << 31) | (key >> 1)
        lo = ((key & 1) << 31) | iota.astype(jnp.uint32)
        k = batch.str_words
        ops = (hi, lo, other) + tuple(
            batch.strw[:, j] for j in range(k)
        ) + (batch.valid.astype(jnp.uint32),)
        out = jax.lax.sort(ops, num_keys=2)
        perm = (out[1] & jnp.uint32(0x7FFFFFFF)).astype(jnp.int32)
        key_sorted = ((out[0] & jnp.uint32(0x7FFFFFFF)) << 1) | (
            out[1] >> 31
        )
        sorted_b = RecordBatch(
            recid=key_sorted if field == 0 else out[2],
            num=out[2] if field == 0 else key_sorted,
            strw=jnp.stack(out[3 : 3 + k], axis=1),
            valid=out[3 + k] == 1,
        )
        return sorted_b, perm
    pre = ()
    if count is not None:
        inactive = (jnp.arange(n, dtype=jnp.int32) >= count).astype(jnp.uint32)
        pre = (inactive,)
    view = sort_keys(batch, field, cfg, pre_words=pre, pre_is_mask=True)
    if use_sort_placement(cfg):
        # dest = inverse permutation: sorting (perm, iota) by perm restores
        # original row order and hands each row its sorted position
        _, (dest,) = sort_words(
            [view.perm.astype(jnp.uint32)],
            (jnp.arange(n, dtype=jnp.int32),),
            stable_iota=False,
        )
        return permute_rows(batch, dest, cfg=cfg), view.perm
    return batch.take(view.perm), view.perm


_sort_batch_jit = per_static_jit(sort_batch_impl)


def sort_batch(
    batch: RecordBatch,
    field,
    cfg: EngineConfig = DEFAULT_CONFIG,
    count: jax.Array | None = None,
) -> tuple[RecordBatch, jax.Array]:
    """Public host-level form: in-budget batches hit the jitted kernel;
    over-budget batches ROUTE through the chunked two-pass driver
    (ops/chunked.py) instead of raising — the reference never refuses, it
    goes external (``DatabaseProject.cpp:172-381``; VERDICT r4 #3b).  The
    jit-safe core (``sort_batch_impl``) keeps its trace-time budget gate
    for in-jit composition."""
    if batch.nrows > cfg.mem_rows:
        from .chunked import sort_batch_chunked

        return sort_batch_chunked(batch, field, cfg, count)
    return _sort_batch_jit(batch, field, cfg, count)


def sort_perm(batch: RecordBatch, field, cfg: EngineConfig = DEFAULT_CONFIG) -> jax.Array:
    """Permutation-only helper (still exact for strings; no record gather)."""
    return sort_keys(batch, field, cfg).perm


def is_sorted(batch: RecordBatch, field, cfg: EngineConfig = DEFAULT_CONFIG) -> jax.Array:
    """bool scalar: batch rows are in non-decreasing key order (full width)."""
    words = key_words(batch, field, None)
    n = batch.nrows
    if n <= 1:
        return jnp.bool_(True)
    lt = jnp.zeros(n - 1, dtype=bool)  # strictly less at first difference
    eq = jnp.ones(n - 1, dtype=bool)
    for w in words:
        lt = lt | (eq & (w[:-1] < w[1:]))
        eq = eq & (w[:-1] == w[1:])
    return jnp.all(lt | eq)
