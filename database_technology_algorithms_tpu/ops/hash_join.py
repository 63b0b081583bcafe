"""Hash join (build-side key set, streamed probe; semi-join semantics).

Reference semantics (``DatabaseProject.cpp:504-647``): the build phase
streams file1 into an STL hash map keyed by the join field with a dummy
value, so the build side collapses to a **key set** for fields 0-2
(``:510-540``); the probe phase streams file2 and, on a hit, copies the
**probe-side record** to the output (``:583-629``) — i.e. a semi-join
emitting file2 rows whose key exists in file1, probe multiplicity preserved.
Field '3' uses an ``unordered_multimap`` that keeps *every* build (num,str)
pair (``:543``), so a probe row is emitted once per matching build record —
full inner-join multiplicity (``:619-628``).

Engine form (this module): one payload-carrying sort of build∪probe by
(active, key, side); each equal-key run then holds the build row first, and
a segmented keep-last scan (ops/scan.py) propagates "run head is an active
build row" + the build multiplicity to every probe row — adjacency +
scans only, no gathers.  The probe-order result comes back via one more
sort by original index (inverse permutation == sort by destination).

Alternative engines for u32 keys: ops/hash_table.py (open-addressing table,
gather-probe — the literal hash-table translation; measured ~300x slower
per probe round on TPU due to gather latency, kept for the API and for
gather-friendly backends) and ops/fastpath.py (searchsorted membership).

nres accounting matches the reference exactly: sum of per-probe-row
multiplicities, where multiplicity is 1 for fields 0-2 and the build-side
duplicate count for field 3.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..batch import FIELD_NUMSTR, RecordBatch, canonical_field
from ..config import DEFAULT_CONFIG, EngineConfig
from ._jit import per_static_jit
from .movement import compact_rows, compact_words, sort_words
from .scan import seg_carry
from .sort import sort_keys


def build_key_multiset(
    build: RecordBatch,
    field,
    cfg: EngineConfig = DEFAULT_CONFIG,
    count: jax.Array | None = None,
) -> tuple[RecordBatch, jax.Array, jax.Array]:
    """Collapse the build side to (unique-key rows, per-key count, n_unique).

    The heir of the reference's hash-table build phase
    (``DatabaseProject.cpp:518-547``) — the map's key set plus, for field 3,
    the multimap's per-key multiplicity.  Per-key counts come from cumsum
    differences at run ends (no scatters).
    """
    n = build.nrows
    pre = ()
    extra = ()
    if count is not None:
        act0 = jnp.arange(n, dtype=jnp.int32) < count
        pre = ((~act0).astype(jnp.uint32),)
        extra = (act0.astype(jnp.uint32),)
    view = sort_keys(build, field, cfg, pre_words=pre, extra=extra,
                     pre_is_mask=True)
    active = (
        jnp.ones(n, dtype=bool) if count is None else view.extras[0] == 1
    )
    adj = view.adj_eq
    new_run = active & ~adj
    # run end: active and (last row, or next row inactive, or next key differs)
    nxt_active = jnp.concatenate([active[1:], jnp.zeros(1, dtype=bool)])
    nxt_same = jnp.concatenate([adj[1:], jnp.zeros(1, dtype=bool)])
    is_end = active & (~nxt_active | ~nxt_same)

    from .scan import cumsum as _bcumsum

    c_incl = _bcumsum(active.astype(jnp.int32))
    from .sort import materialize_survivors

    uniq, n_unique = materialize_survivors(build, view.perm, new_run, cfg)
    _, (ends,) = compact_words(is_end, (c_incl,))
    prev = jnp.concatenate([jnp.zeros(1, jnp.int32), ends[:-1]])
    counts = jnp.where(
        jnp.arange(n, dtype=jnp.int32) < n_unique, ends - prev, 0
    )
    return uniq, counts, n_unique


def probe_multiplicity(
    build_uniq: RecordBatch,
    build_counts: jax.Array,
    n_build: jax.Array,
    probe: RecordBatch,
    field,
    cfg: EngineConfig = DEFAULT_CONFIG,
    probe_count: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Per-probe-row (matched, build_multiplicity), in probe original order.

    Sort build∪probe by (active, key, side): each equal-key run holds at
    most one build row, first.  A segmented keep-last scan hands every row
    its run head's (is-build, multiplicity); one final sort by original
    index returns the answers to probe order.
    """
    nb, np_ = build_uniq.nrows, probe.nrows
    both = RecordBatch.concat([build_uniq, probe])
    n = nb + np_
    idx = jnp.arange(n, dtype=jnp.int32)
    probe_active = (
        jnp.ones(n, dtype=bool) if probe_count is None else (idx - nb) < probe_count
    )
    active = jnp.where(idx < nb, idx < n_build, probe_active)
    inactive_w = (~active).astype(jnp.uint32)
    counts_w = jnp.concatenate(
        [build_counts.astype(jnp.uint32), jnp.zeros(np_, jnp.uint32)]
    )

    # side rides free on the row-index stability key (build rows occupy
    # [0, nb) so iota order IS build-before-probe within a key run), and
    # the sorted original index is just view.perm — 3 fewer sort operands
    view = sort_keys(
        both, field, cfg,
        pre_words=(inactive_w,),
        extra=(active.astype(jnp.uint32), counts_w),
        pre_is_mask=True,
    )
    s_act, s_cnt = view.extras
    s_side = (view.perm >= nb).astype(jnp.uint32)
    s_orig = view.perm
    is_start = ~view.adj_eq  # element 0 always True
    # head info packed: bit31 = head is an active build row; low bits = count
    head_is_build = is_start & (s_side == 0) & (s_act == 1)
    head_info = jnp.where(
        is_start,
        (head_is_build.astype(jnp.uint32) << 31)
        | jnp.minimum(s_cnt, jnp.uint32(0x7FFFFFFF)),
        0,
    )
    carry = seg_carry(is_start, head_info)
    probe_here = (s_side == 1) & (s_act == 1)
    matched_sorted = probe_here & ((carry >> 31) == 1)
    mult_sorted = jnp.where(matched_sorted, carry & jnp.uint32(0x7FFFFFFF), 0)

    # inverse permutation == sort by original index (probe rows first nb..n-1)
    ord_key = jnp.where(s_side == 1, s_orig, jnp.int32(n))
    _, (m2, mu2) = sort_words(
        [ord_key.astype(jnp.uint32)],
        (matched_sorted.astype(jnp.uint32), mult_sorted.astype(jnp.int32)),
    )
    matched = m2[:np_].astype(bool)
    mult = mu2[:np_]
    return matched, mult


def _fused_matched_mult(
    build: RecordBatch,
    probe: RecordBatch,
    field,
    cfg: EngineConfig,
    build_count: jax.Array | None,
    probe_count: jax.Array | None,
) -> tuple[jax.Array, jax.Array]:
    """(matched bool[P], build-multiplicity int32[P]) from ONE fused sort.

    r3 rewrite: the original generic path first *materialized* the build
    key set (build_key_multiset: key sort + placement sorts) and then ran
    a second concat sort — ~22 ms at 1M x 1M on-chip.  Counting needs no
    record movement at all: sort build||probe once by (active, key, iota)
    (build rows precede probe rows within a key — their indices are
    smaller), segment-scan each run's active-build total to every row, and
    return answers to probe order with one small sort.  ~2.5x fewer sort
    operands; measured in PERF_NOTES.md.
    """
    nb, npr = build.nrows, probe.nrows
    both = RecordBatch.concat([build, probe])
    n = nb + npr
    idx = jnp.arange(n, dtype=jnp.int32)
    b_active = (
        idx < nb
        if build_count is None
        else (idx < nb) & (idx < build_count)
    )
    p_active = (
        idx >= nb
        if probe_count is None
        else (idx >= nb) & ((idx - nb) < probe_count)
    )
    active = b_active | p_active
    if field in (0, 1) and cfg.packed_u32_sorts:
        # single-word keys: the (inactive, key, iota) sort bit-packs into
        # 2 operands, and the activity mask falls out of the sorted hi bit
        # instead of riding as a payload word — 4 operands -> 2 (r4,
        # ops/sort.packed_u32_view_sort; order verified identical)
        from .sort import packed_u32_view_sort

        key = both.recid if field == 0 else both.num
        s_key, perm, active_s, _ = packed_u32_view_sort(
            (~active).astype(jnp.uint32), key
        )
        adj = jnp.concatenate(
            [jnp.zeros(1, bool), s_key[1:] == s_key[:-1]]
        )
        s_build = perm < nb
        view_perm = perm
    else:
        view = sort_keys(
            both, field, cfg,
            pre_words=((~active).astype(jnp.uint32),),
            extra=(active.astype(jnp.uint32),),
        )
        (s_act,) = view.extras
        active_s = s_act == 1
        s_build = view.perm < nb
        adj = view.adj_eq
        view_perm = view.perm
    is_start = ~adj
    end_flags = jnp.concatenate([is_start[1:], jnp.ones(1, bool)])

    from .scan import seg_carry

    ab = (active_s & s_build).astype(jnp.int32)
    from .scan import cumsum as _bcumsum

    cb = _bcumsum(ab)  # inclusive active-build count
    # run's build total = (inclusive cb at run end) - (exclusive cb at start)
    start_excl = seg_carry(
        is_start, jnp.where(is_start, cb - ab, 0).astype(jnp.uint32)
    ).astype(jnp.int32)
    end_incl = jnp.flip(
        seg_carry(
            jnp.flip(end_flags),
            jnp.flip(jnp.where(end_flags, cb, 0).astype(jnp.uint32)),
        )
    ).astype(jnp.int32)
    mult_sorted = jnp.where(active_s & ~s_build, end_incl - start_excl, 0)

    # answers back to probe original order: probe rows' perm values are
    # their concat indices (nb..n-1), already monotone in probe order.
    # Only mult rides the un-permute — matched is mult > 0 by definition
    # (the r3 form carried a redundant matched operand; 3 -> 2 ops, r4)
    ord_key = jnp.where(~s_build, view_perm, jnp.int32(n)).astype(jnp.uint32)
    if field in (0, 1) and cfg.packed_u32_sorts:
        # fields 0/1 discard the multiplicity (hash_join_count_impl reads
        # only matched): the match BIT packs into the ord word — the
        # un-permute shrinks to ONE operand (2 -> 1, r4)
        packed = (ord_key << 1) | (mult_sorted > 0).astype(jnp.uint32)
        (sp,) = jax.lax.sort((packed,), num_keys=1)
        matched = (sp[:npr] & 1) == 1
        return matched, matched.astype(jnp.int32)
    out = jax.lax.sort((ord_key, mult_sorted), num_keys=1)
    mult = out[1][:npr]
    return (mult > 0), mult


def member_multiplicity(
    bwords: list, n_bkeys: jax.Array, kwords: list, live_k: jax.Array
) -> jax.Array:
    """Per-key BUILD MULTIPLICITY against a sorted build key word list.

    ``bwords``: sorted build keys (live rows first, ``n_bkeys`` of them);
    ``kwords``: query keys in any order with ``live_k`` mask.  One small
    sort of build-keys ++ query-keys by (inactive, words..., iota) and a
    pair of run scans hand every query key its run's live-build count —
    the same trick as :func:`_fused_matched_mult` at sub-table granularity.
    Returns counts (u32, 0 = no match) in query order; fields 0-2 read it
    as a boolean, field '3' sums it for the reference's multimap nres
    (``DatabaseProject.cpp:619-628``).  Shared by the overlapped
    distributed join (per exchange chunk) and the tiled over-budget join
    (per cell pair).
    """
    from .scan import cumsum as _bcumsum, seg_carry

    m = bwords[0].shape[0]
    c = kwords[0].shape[0]
    n = m + c
    pos_b = jnp.arange(m, dtype=jnp.int32)
    live = jnp.concatenate([pos_b < n_bkeys, live_k])
    inact = (~live).astype(jnp.uint32)
    iota = jnp.arange(n, dtype=jnp.int32)
    words = tuple(
        jnp.concatenate([bw, kw]) for bw, kw in zip(bwords, kwords)
    )
    if len(words) == 1 and n < (1 << 30):
        # single-word keys: bit-pack (inact, key, iota) into 2 operands —
        # the packed_u32_view_sort layout at cell granularity (r5: the
        # tiled join's per-cell cost dropped ~2x; run identity is the
        # KEY, so s_key ignores the inact bit exactly like the fused path)
        key = words[0].astype(jnp.uint32)
        hi = (inact << 31) | (key >> 1)
        lo = ((key & 1) << 31) | iota.astype(jnp.uint32)
        shi, slo = jax.lax.sort((hi, lo), num_keys=2)
        s_live = (shi >> 31) == 0
        s_key = (shi << 1) | (slo >> 31)
        perm = (slo & jnp.uint32(0x7FFFFFFF)).astype(jnp.int32)
        s_words = (s_key,)
    elif len(words) + 2 <= 18:
        ops = (inact,) + words + (iota,)
        out = jax.lax.sort(ops, num_keys=len(ops))
        s_words = out[1:-1]
        perm = out[-1]
        s_live = out[0] == 0
    else:
        # wide string keys: a >18-operand variadic sort is the documented
        # compile cliff (sort.py module docstring) — LSD stable refinement
        # instead, constant operand count per pass (the r5 heir of the r4
        # wide-key refusal; exact strcmp order, VERDICT r4 #3c)
        perm = iota
        for w in reversed(words):
            perm = jax.lax.sort(
                (w[perm], perm), num_keys=1, is_stable=True
            )[1]
        perm = jax.lax.sort(
            (inact[perm], perm), num_keys=1, is_stable=True
        )[1]
        s_words = tuple(w[perm] for w in words)
        s_live = live[perm]
    eq_prev = jnp.ones(n - 1, dtype=bool)
    for w in s_words:
        eq_prev &= w[1:] == w[:-1]
    is_start = jnp.concatenate([jnp.ones(1, bool), ~eq_prev])
    end_flags = jnp.concatenate([is_start[1:], jnp.ones(1, bool)])
    ab = ((perm < m) & s_live).astype(jnp.int32)
    cb = _bcumsum(ab)
    start_excl = seg_carry(
        is_start, jnp.where(is_start, cb - ab, 0).astype(jnp.uint32)
    ).astype(jnp.int32)
    end_incl = jnp.flip(
        seg_carry(
            jnp.flip(end_flags),
            jnp.flip(jnp.where(end_flags, cb, 0).astype(jnp.uint32)),
        )
    ).astype(jnp.int32)
    cnt_sorted = jnp.where(
        (perm >= m) & s_live, end_incl - start_excl, 0
    ).astype(jnp.uint32)
    # back to query order: query rows' perm values are m..n-1, monotone
    ord_key = jnp.where(perm >= m, perm, jnp.int32(n)).astype(jnp.uint32)
    if n < (1 << 16):
        # small cells: (ord_key, count) both fit 16 bits (count <= build
        # rows in the cell < n) — 1-operand packed back-sort (r5)
        (sp,) = jax.lax.sort(((ord_key << 16) | cnt_sorted,), num_keys=1)
        return sp[:c] & jnp.uint32(0xFFFF)
    back = jax.lax.sort((ord_key, cnt_sorted), num_keys=1)
    return back[1][:c]


def _next_pow2(x: int) -> int:
    p = 1
    while p < x:
        p *= 2
    return p


def _tile_layout(
    nb: int, npr: int, mem_rows: int, cap_mult: int = 1
) -> tuple[int, int, int, int]:
    """(ntiles, cap_b, cap_p, group) for the tiled over-budget join.

    The ONE definition of the tiling geometry — production and the
    profiler (tools/profile_tiled.py) must agree or the profiler measures
    cells of a shape production never runs (r5 review).  Tiles are sized
    so (a) a GROUP of cell pairs fits the row budget and (b) a pair leans
    toward the measured batched-sort sweet spot (~16K rows/side); cell
    capacity carries 1.5x slack over a uniform murmur split (tens of
    sigma at practical cell sizes; the host retry doubles ``cap_mult`` on
    the astronomical miss).
    """
    mem = max(int(mem_rows), 2)
    ntiles = max(
        _next_pow2(-(-(2 * (nb + npr)) // mem)),
        _next_pow2(-(-(nb + npr) // 16384)),
        2,
    )

    def cap_for(n):
        c = max(((-(-n // ntiles)) * 3 * cap_mult + 1) // 2, 64)
        return -(-c // 8) * 8  # 8-row aligned cells

    cap_b, cap_p = cap_for(nb), cap_for(npr)
    group = max(min(mem // (cap_b + cap_p), ntiles), 1)
    while ntiles % group:
        group -= 1  # powers of two in practice; loop is the general guard
    return ntiles, cap_b, cap_p, group


def _tiled_matched_mult(
    build: RecordBatch,
    probe: RecordBatch,
    field,
    cfg: EngineConfig,
    build_count: jax.Array | None,
    probe_count: jax.Array | None,
    cap_mult: int = 1,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Over-budget join: device-tiled passes instead of refusal. Jit-safe.

    The reference's nmem_blocks contract forces external algorithms when
    inputs exceed the buffer (``dbtproj.h:48``); its own HashJoin ignores
    the contract and grows without bound (``DatabaseProject.cpp:510-548``).
    Here a table pair beyond ``cfg.mem_rows`` is hash-partitioned into T
    cells per side (one streaming partition pass — the device analogue of
    the external drivers' spill pass) and a ``lax.scan`` joins G cell
    pairs per step as ONE batched (vmapped) membership kernel, so each
    device step's working set stays <= mem_rows rows (the Pallas-grid
    analogue of nmem_blocks, SURVEY §2.3).  Cells are sized toward the
    measured batched-sort sweet spot (PERF_NOTES r4: many ~8-64K tiles
    sort several times faster than one flat tile), so an over-budget join
    issues O(T/G) device steps of small batched sorts rather than T
    sequential near-budget sorts (VERDICT r4 #6).  Only key words ride
    the cells; match/multiplicity masks return to probe order through one
    placement sort.

    Cell capacities carry ``2 * cap_mult`` slack over a uniform hash
    split.  Overflow is RETURNED, not handled here: the host-level driver
    (``hash_join_count``) retries with doubled ``cap_mult`` — keeping the
    whole-table fallback OUT of the traced program, so XLA's buffer
    assignment reserves only tiled-branch temporaries (the r4 cond-based
    fallback made the executable reserve whole-table sort temporaries
    even when the tiled branch ran; VERDICT r4 #3a).
    """
    from .keys import key_hash, key_words
    from .movement import stage_to_cells

    nb, npr = build.nrows, probe.nrows
    ntiles, cap_b, cap_p, group = _tile_layout(
        nb, npr, cfg.mem_rows, cap_mult
    )
    idx_b = jnp.arange(nb, dtype=jnp.int32)
    idx_p = jnp.arange(npr, dtype=jnp.int32)
    b_active = jnp.ones(nb, bool) if build_count is None else idx_b < build_count
    p_active = jnp.ones(npr, bool) if probe_count is None else idx_p < probe_count
    hb = key_hash(build, field) % jnp.uint32(ntiles)
    hp = key_hash(probe, field) % jnp.uint32(ntiles)
    bkw = key_words(build, field)
    pkw = key_words(probe, field)
    # cross-width string keys: the narrower side's missing trailing words
    # are provably zero (narrow-width invariant), so zero-pad both lists
    # to a common width — member_multiplicity zips them positionally and
    # would otherwise compare only the shared prefix (r4 review finding)
    nw = max(len(bkw), len(pkw))
    bkw = bkw + [jnp.zeros(nb, jnp.uint32)] * (nw - len(bkw))
    pkw = pkw + [jnp.zeros(npr, jnp.uint32)] * (nw - len(pkw))
    bcells, bcnt, _, ovf_b = stage_to_cells(
        hb, b_active, ntiles, cap_b, bkw, row_map="none"
    )
    pcells, pcnt, si_p, ovf_p = stage_to_cells(
        hp, p_active, ntiles, cap_p, pkw, row_map="si"
    )

    nsteps = ntiles // group
    xs = (
        tuple(w.reshape(nsteps, group, cap_b) for w in bcells),
        tuple(w.reshape(nsteps, group, cap_p) for w in pcells),
        bcnt.reshape(nsteps, group),
        pcnt.reshape(nsteps, group),
    )

    def one_pair(bw, pw, cb, cp):
        live = jnp.arange(cap_p, dtype=jnp.int32) < cp
        return member_multiplicity(list(bw), cb, list(pw), live)

    batched_pairs = jax.vmap(one_pair)

    def body(carry, x):
        bw, pw, cb, cp = x
        return carry, batched_pairs(bw, pw, cb, cp)

    _, mult_cells = jax.lax.scan(body, jnp.int32(0), xs)  # [S, G, cap_p]
    # slot-order mults back to probe rows through SORTS, not the 1M
    # random gather (measured 7 ms latency-bound vs ~3 ms of sorts, r5):
    # compact occupied slots' mults (slot order); the staging
    # permutation si_p is ALREADY the probe rows in slot order (valid
    # while nothing overflowed — an overflow discards this attempt at
    # the host retry anyway), so one un-permute sort finishes the job.
    # Probe rows beyond their cell cap or inactive carry 0.
    mp = ntiles * cap_p
    occupied_p = (
        jnp.arange(cap_p, dtype=jnp.int32)[None, :] < pcnt[:, None]
    ).reshape(mp)
    _, (mult_slots,) = compact_words(
        occupied_p, (mult_cells.reshape(mp),)
    )
    n_staged = jnp.sum(pcnt)  # occupied slots == staged rows
    pos = jnp.arange(npr, dtype=jnp.int32)
    mult_in_slot_order = jnp.where(pos < n_staged, mult_slots[:npr], 0)
    _, mult_rows_u = jax.lax.sort(
        (si_p, mult_in_slot_order), num_keys=1
    )
    mult_rows = mult_rows_u.astype(jnp.int32)
    return mult_rows > 0, mult_rows, ovf_b + ovf_p


def hash_join_count_impl(
    build: RecordBatch,
    probe: RecordBatch,
    field,
    cfg: EngineConfig = DEFAULT_CONFIG,
    build_count: jax.Array | None = None,
    probe_count: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Jit-safe core: returns (matched bool[P], mult int32[P], nres).

    nres reproduces the reference counter: fields 0-2 count each matched
    probe row once; field 3 counts build-side duplicates per probe row.
    build_count/probe_count mark live rows under the static-capacity
    convention (padding rows never build nor match).
    """
    from ..utils.checks import ensure_device_budget

    field = canonical_field(field)
    # jit-safe IN-BUDGET core: over-budget inputs belong to the public
    # host-level ``hash_join_count`` driver (tiled passes + capacity
    # retry), which cannot run inside a traced program
    ensure_device_budget(build.nrows + probe.nrows, cfg, "hash_join_count")
    if field in (0, 1) and cfg.u32_join_engine != "generic":
        # single-word key engines (dispatch measured per backend; all three
        # return identical results — tests/test_placement.py asserts it)
        if cfg.u32_join_engine == "searchsorted":
            from .fastpath import hash_join_count_u32

            return hash_join_count_u32(
                build, probe, field,
                build_count=build_count, probe_count=probe_count,
            )
        if cfg.u32_join_engine == "table":
            from .hash_table import hash_join_count_table

            return hash_join_count_table(
                build, probe, field, cfg,
                build_count=build_count, probe_count=probe_count,
            )
        if cfg.u32_join_engine == "bucketed":
            from .bucket_join import hash_join_count_bucketed

            return hash_join_count_bucketed(
                build, probe, field, cfg,
                build_count=build_count, probe_count=probe_count,
            )
        raise ValueError(f"unknown u32_join_engine {cfg.u32_join_engine!r}")
    matched, mult = _fused_matched_mult(
        build, probe, field, cfg, build_count, probe_count
    )
    if field == FIELD_NUMSTR:
        nres = jnp.sum(mult)
    else:
        mult = matched.astype(jnp.int32)
        nres = jnp.sum(mult)
    return matched, mult, nres


_hash_join_count_jit = per_static_jit(hash_join_count_impl)


def _tiled_count_impl(
    build: RecordBatch,
    probe: RecordBatch,
    field,
    cfg: EngineConfig = DEFAULT_CONFIG,
    build_count: jax.Array | None = None,
    probe_count: jax.Array | None = None,
    cap_mult: int = 1,
):
    """Jit program for one tiled attempt: (matched, mult, nres, overflow)."""
    field = canonical_field(field)
    matched, mult, ovf = _tiled_matched_mult(
        build, probe, field, cfg, build_count, probe_count, cap_mult
    )
    if field == FIELD_NUMSTR:
        nres = jnp.sum(mult)
    else:
        mult = matched.astype(jnp.int32)
        nres = jnp.sum(mult)
    return matched, mult, nres, ovf


_tiled_count = per_static_jit(
    _tiled_count_impl, static_names=("field", "cfg", "cap_mult")
)


def hash_join_count(
    build: RecordBatch,
    probe: RecordBatch,
    field,
    cfg: EngineConfig = DEFAULT_CONFIG,
    build_count: jax.Array | None = None,
    probe_count: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Public host-level driver: (matched, mult, nres) at any size.

    In-budget pairs hit the jitted kernel.  Over-budget pairs run the
    device-tiled passes with a HOST-LEVEL capacity-doubling retry on cell
    overflow: the whole-table fallback lives above the jit boundary, so
    the compiled over-budget executable reserves only O(mem_rows)-cell
    temporaries (VERDICT r4 #3a; the r4 ``lax.cond`` fallback made XLA
    reserve whole-table sort temporaries it never used).  Overflow at
    2x slack needs adversarial hash collisions — i.e. extreme key skew —
    and each retry doubles cell capacity, reaching whole-side cells in
    <= log2(ntiles) steps; the working set then degrades gracefully
    toward the single-kernel cost (the reference's own HashJoin has no
    bound at all, ``DatabaseProject.cpp:510-548``).
    """
    if build.nrows + probe.nrows <= cfg.mem_rows:
        return _hash_join_count_jit(
            build, probe, field, cfg, build_count, probe_count
        )
    cap_mult = 1
    while True:
        matched, mult, nres, ovf = _tiled_count(
            build, probe, field, cfg, build_count, probe_count, cap_mult
        )
        if int(ovf) == 0:
            return matched, mult, nres
        cap_mult *= 2


def hash_join_impl(
    build: RecordBatch,
    probe: RecordBatch,
    field,
    cfg: EngineConfig = DEFAULT_CONFIG,
) -> tuple[RecordBatch, jax.Array]:
    """Semi-join emitting matched probe rows (fields 0-2), probe order.

    Returns (probe_capacity_batch, nres).  For field 3 the emitted *rows* are
    the matched probe rows (deduplicated against build multiplicity); use
    ``hash_join_count``/``materialize_field3`` when the reference's
    row-repetition output is required.

    Jit-safe IN-BUDGET core; the public ``hash_join`` routes over-budget
    pairs through the tiled count + chunked compaction host driver.
    """
    from ..utils.checks import ensure_device_budget

    ensure_device_budget(probe.nrows, cfg, "hash_join[materializing]")
    matched, _, nres = hash_join_count_impl(build, probe, field, cfg)
    out, _, _ = compact_rows(probe, matched)
    return out, nres


_hash_join_jit = per_static_jit(hash_join_impl)


def hash_join(
    build: RecordBatch,
    probe: RecordBatch,
    field,
    cfg: EngineConfig = DEFAULT_CONFIG,
) -> tuple[RecordBatch, jax.Array]:
    """Public host-level form: semi-join at any size.

    Over-budget pairs get their match mask from the tiled host driver and
    materialize through budget-sized gather chunks (ops/chunked.py)
    instead of one probe-capacity placement sort — no ``MemoryBudgetError``
    is reachable (VERDICT r4 #3; streams/files still belong to
    ``external.external_hash_join``)."""
    if build.nrows + probe.nrows <= cfg.mem_rows:
        return _hash_join_jit(build, probe, field, cfg)
    from .chunked import compact_rows_chunked

    matched, _, nres = hash_join_count(build, probe, field, cfg)
    out, _ = compact_rows_chunked(probe, np.asarray(matched), cfg)
    return out, nres


def materialize_field3_device(
    probe: RecordBatch, mult: jax.Array, cap: int
) -> tuple[RecordBatch, jax.Array]:
    """Device-side segmented expansion: emit probe row j ``mult[j]`` times.

    The reference's field-3 multimap emits one probe row per matching build
    (num,str) pair (``DatabaseProject.cpp:619-628``) — inner-join
    multiplicity.  Output size is data-dependent, so the result is
    capacity-bounded (``cap`` rows) with the true total returned: out row i
    (i < total) sources probe row ``searchsorted(cumsum(mult), i, 'right')``
    — a vectorized binary search plus one record gather, the only engine
    primitive that can DUPLICATE rows (placement sorts only permute).
    Rows past the total are zeroed; total > cap means the caller's capacity
    was too small (re-run with cap = total).
    """
    c = jnp.cumsum(mult.astype(jnp.int32))
    total = c[-1] if probe.nrows else jnp.int32(0)
    i = jnp.arange(cap, dtype=jnp.int32)
    src = jnp.searchsorted(c, i, side="right").astype(jnp.int32)
    src = jnp.where(i < total, src, jnp.int32(probe.nrows))
    return probe.take_fill(src), total


def materialize_field3(
    probe: RecordBatch, matched: np.ndarray, mult: np.ndarray
) -> RecordBatch:
    """Host-side np.repeat form of ``materialize_field3_device`` (exact
    output size, used at IO boundaries where the total is already known)."""
    reps = np.asarray(mult)
    cols = probe.to_numpy()
    return RecordBatch.from_numpy(
        np.repeat(cols["recid"], reps),
        np.repeat(cols["num"], reps),
        np.repeat(cols["strs"], reps, axis=0),
        np.repeat(cols["valid"], reps),
        normalize=False,
    )
