"""Word-level data movement helpers.

Measured design point (PERF_NOTES.md; r3 numbers): a few-operand
``lax.sort`` at 1M rows costs ~0.5-1 ms, a random row gather ~7 ms
(all columns consumed — beware XLA's dead-sort-operand pruning when
microbenchmarking), scatters worse, and sorts with many operands explode
XLA compile time.  The engine therefore (a) sorts only small word sets,
(b) never scatters, and (c) moves whole records through **grouped
payload-carrying sorts** (``place_words``/``permute_rows``): the 3+K
record words (narrow-width storage, batch.py) ride as sort payload in
groups of ≤7 per ``lax.sort`` call, keyed by each row's destination
position — the TPU-native replacement for the row gather (the
reference's per-record memcpy hot loops,
``DatabaseProject.cpp:303-326,583-629``).  The gather is kept only where
rows must be DUPLICATED (field-3 expansion) or on gather-fast backends.

``compact_rows`` is the mask→dense-prefix form of that: destinations are
survivor ranks, drops sink past the live count.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..batch import RecordBatch
from ..config import DEFAULT_CONFIG, EngineConfig

# payload words carried per lax.sort call: 1 key + 7 payload = 8 operands
# keeps XLA's sort expansion compile-cheap while amortizing pass overhead
PLACE_GROUP = 7


def use_sort_placement(cfg: EngineConfig = DEFAULT_CONFIG) -> bool:
    """Static (trace-time) choice of row-movement engine.

    "sort"  — grouped payload sorts (TPU: gathers are ~32 ns/row, sorts are
              near memory speed);
    "gather"— one fused jnp.take (CPU/GPU backends where gathers are fast);
    "auto"  — sort on TPU, gather elsewhere.
    """
    if cfg.materialize in ("sort", "sort2d"):
        return True
    if cfg.materialize == "gather":
        return False
    if cfg.materialize != "auto":
        raise ValueError(f"unknown materialize engine: {cfg.materialize!r}")
    return jax.default_backend() == "tpu"


def place_words(
    dest: jax.Array, words: list[jax.Array], group: int = PLACE_GROUP
) -> list[jax.Array]:
    """out[dest[i]] = words[:][i] via grouped payload-carrying sorts.

    dest must hold unique u32 values (any total order, not necessarily
    dense); each group of ≤`group` words rides one 1-key lax.sort.
    """
    destu = dest.astype(jnp.uint32)
    outs: list[jax.Array] = []
    for base in range(0, len(words), group):
        chunk = tuple(words[base : base + group])
        res = jax.lax.sort((destu,) + chunk, num_keys=1)
        outs.extend(res[1:])
    return outs


def place_words_2d(
    dest: jax.Array, cnt: jax.Array | None, words: list[jax.Array], npay: int = 1
) -> tuple[jax.Array, ...]:
    """out[dest[i]] = words[:][i] via ONE replicated-key 2-D lax.sort.

    The W payload words ride as an [N, W] matrix operand (split into `npay`
    matrices) keyed by dest broadcast to the same shape: every column sorts
    independently along axis 0 by an identical key column, so rows move
    coherently.  Requires UNIQUE dest values (a non-stable sort may resolve
    ties differently per column).

    MEASURED NEGATIVE RESULT (tools/bench_permute_prims.py P1, target chip,
    1M rows): a 2-operand [N,4] replicated-key sort costs 14.6 ms vs
    1.12 ms for the flat [N] 2-operand sort — XLA's TPU sort pays ~13x per
    batched column, so 35 words cost 73-131 ms here vs 17 ms through
    grouped 1-D sorts.  Kept as the documented alternative (and for
    backends where batched-column sorts vectorize); place_grouped remains
    the production materializer.

    With `cnt`, rows placed at positions >= cnt are zeroed (the static-
    capacity live-count convention, same as place_grouped).
    """
    n = dest.shape[0]
    w = len(words)
    destu = dest.astype(jnp.uint32)
    group = -(-w // npay)  # ceil
    outs: list[jax.Array] = []
    for base in range(0, w, group):
        chunk = words[base : base + group]
        pay = jnp.stack([c.astype(jnp.uint32) for c in chunk], axis=1)
        krep = jnp.broadcast_to(destu[:, None], pay.shape)
        placed = jax.lax.sort((krep, pay), num_keys=1, dimension=0)[1]
        if cnt is not None:
            live = (jnp.arange(n, dtype=jnp.int32) < cnt)[:, None]
            placed = jnp.where(live, placed, 0)
        outs.extend(placed[:, j] for j in range(len(chunk)))
    return tuple(outs)


@jax.jit
def place_group(dest: jax.Array, cnt: jax.Array, *words: jax.Array):
    """One placement-sort group (<= PLACE_GROUP payload words) as its own
    jitted program, with live-count zeroing.

    The compile service on the round-2 machine reproducibly WEDGES (>25 min,
    twice) on an all-groups-in-one-program materializer while single
    smaller programs compile; the grouped form costs a few extra host
    dispatches per materialization, which queue asynchronously (~free), and
    compiles one executable per distinct word count (7-word and tail).
    (The one-program form, place35, was removed in r4: superseded by
    narrow-width storage — the materializer is one group now — and kept
    alive only by its own equality test.)
    """
    n = dest.shape[0]
    live = jnp.arange(n, dtype=jnp.int32) < cnt
    res = jax.lax.sort((dest,) + tuple(words), num_keys=1)
    return tuple(jnp.where(live, w, 0) for w in res[1:])


def place_grouped(
    dest: jax.Array, cnt: jax.Array, words: list[jax.Array]
) -> list[jax.Array]:
    """place35 semantics through per-group jitted programs (see place_group)."""
    outs: list[jax.Array] = []
    for base in range(0, len(words), PLACE_GROUP):
        outs.extend(place_group(dest, cnt, *words[base : base + PLACE_GROUP]))
    return outs


@jax.jit
def _place_batch_fused(dest, cnt, recid, num, strw, valid):
    """place_batch's narrow-width form as ONE jitted program.

    Everything — key fold, the placement sort, valid unfold, capacity
    zeroing, the strw restack — fuses into a single executable: the first
    r4 cut ran the unfold/zeroing as eager per-op dispatches through the
    tunnel, which cost MORE than the saved sort operand (measured: the
    materialized variants regressed 1.5-5x until fused)."""
    n = dest.shape[0]
    keyw = (dest.astype(jnp.uint32) << 1) | valid.astype(jnp.uint32)
    words = (recid, num) + tuple(strw[:, j] for j in range(strw.shape[1]))
    res = jax.lax.sort((keyw,) + words, num_keys=1)
    skey = res[0]
    live = jnp.arange(n, dtype=jnp.int32) < cnt
    cols = [jnp.where(live, w, 0) for w in res[1:]]
    valid_o = ((skey & 1) == 1) & live
    return cols[0], cols[1], jnp.stack(cols[2:], axis=1), valid_o


import functools


@functools.partial(jax.jit, static_argnames=("key_plane",))
def _place_join_by_key_fused(
    matched, key, cnt, recid, num, strw, valid, key_plane="none"
):
    """Join-output materialization WITHOUT a destination permutation.

    The survivor placement "matched rows first, in (key, row-index)
    order" is itself a sort of the R half by (unmatched, key, iota) —
    so instead of deriving a dense dest permutation (a 2-operand back
    sort over the CONCAT length) and placement-sorting by it, sort R
    directly with the packed 2-word key (ops/sort.packed_u32_view_sort
    layout) carrying the payload.  One program; u32 key fields only.

    The row's ORIGINAL valid flag rides in lo bit 30 (above iota, below
    the key LSB): matched rows have unique keys so it never influences
    their relative order, and rows past cnt are zeroed regardless — the
    output preserves valid exactly like the permutation engines do
    (liveness stays the count's business, r4 review finding).  Requires
    n < 2^30.

    ``key_plane`` ("recid" | "num" | "none") names the payload column the
    key CAME from: the packed sort words already carry the full key
    (hi bits 30:0 = key bits 31:1, lo bit 31 = key bit 0), so that column
    is reconstructed from the sorted words instead of riding as payload —
    one fewer sort operand (6 -> 5 at narrow width; r5 floor-accounting
    win, PERF_NOTES).
    """
    n = key.shape[0]
    unm = (~matched).astype(jnp.uint32)
    hi = (unm << 31) | (key >> 1)
    lo = (
        ((key & 1) << 31)
        | (valid.astype(jnp.uint32) << 30)
        | jnp.arange(n, dtype=jnp.uint32)
    )
    payload = {"recid": recid, "num": num}
    if key_plane in payload:
        del payload[key_plane]
    ops = (hi, lo) + tuple(payload.values()) + tuple(
        strw[:, j] for j in range(strw.shape[1])
    )
    out = jax.lax.sort(ops, num_keys=2)
    live = jnp.arange(n, dtype=jnp.int32) < cnt
    cols = [jnp.where(live, w, 0) for w in out[2:]]
    if key_plane in ("recid", "num"):
        key_sorted = ((out[0] & jnp.uint32(0x7FFFFFFF)) << 1) | (
            out[1] >> 31
        )
        key_col = jnp.where(live, key_sorted, 0)
        if key_plane == "recid":
            recid_o, num_o, rest = key_col, cols[0], cols[1:]
        else:
            recid_o, num_o, rest = cols[0], key_col, cols[1:]
    else:
        recid_o, num_o, rest = cols[0], cols[1], cols[2:]
    valid_o = (((out[1] >> 30) & 1) == 1) & live
    return recid_o, num_o, jnp.stack(rest, axis=1), valid_o


def place_join_by_key(
    matched: jax.Array,
    key: jax.Array,
    cnt: jax.Array,
    batch: RecordBatch,
    key_plane: str = "none",
) -> RecordBatch:
    """See _place_join_by_key_fused. ``matched`` and ``key`` are per-row
    of ``batch`` (original order); rows past ``cnt`` zeroed."""
    recid, num, strw, valid = _place_join_by_key_fused(
        matched, key, cnt, batch.recid, batch.num, batch.strw, batch.valid,
        key_plane=key_plane,
    )
    return RecordBatch(recid=recid, num=num, strw=strw, valid=valid)


def packed_keep_backsort(
    perm: jax.Array, keep: jax.Array, n_front: int
) -> jax.Array:
    """A keep mask over SORTED positions, returned in ORIGINAL row order
    for the first ``n_front`` original rows — as ONE 1-operand packed
    sort of ``perm<<1 | keep`` (perm is a permutation, so sorting the
    packed word restores original order with the mask in the low bit).

    The shared core of every direct-sort materialization (join, staged
    pipeline, distinct — r5 review: four hand-rolled copies had begun to
    drift on their guards).  Requires ``perm`` values < 2^31.
    """
    packed = (perm.astype(jnp.uint32) << 1) | keep.astype(jnp.uint32)
    (sp,) = jax.lax.sort((packed,), num_keys=1)
    return (sp[:n_front] & 1) == 1


def place_batch(
    dest: jax.Array,
    cnt: jax.Array | None,
    batch: RecordBatch,
) -> RecordBatch:
    """Whole-record placement with the VALID FLAG FOLDED INTO THE KEY.

    ``payload_words()`` spends a full sort operand on the 1-bit valid
    column; here the placement key is ``dest<<1 | valid`` (dest values are
    unique, so the fold preserves the order exactly) and valid is read
    back from the sorted key's low bit — one fewer operand (6 -> 5 at
    narrow width; needs dest < 2^31, guaranteed by the device budget).
    Rows placed at positions >= cnt are zeroed (static-capacity
    convention; cnt=None keeps every row).

    Narrow widths (2 + K <= PLACE_GROUP payload words) run as ONE fused
    jitted program; wider batches fall back to the grouped payload-word
    placement (one group per 7 words — fusing many 8-operand sorts into
    one program is the known compile-service wedge, r2).
    """
    n = batch.nrows
    if 2 + batch.str_words <= PLACE_GROUP:
        cnt_v = jnp.int32(n) if cnt is None else cnt
        recid, num, strw, valid = _place_batch_fused(
            dest, cnt_v, batch.recid, batch.num, batch.strw, batch.valid
        )
        return RecordBatch(recid=recid, num=num, strw=strw, valid=valid)
    words = batch.payload_words()
    cnt_v = jnp.int32(n) if cnt is None else cnt
    placed = place_grouped(dest, cnt_v, words)
    return RecordBatch.from_payload_words(placed)


def permute_rows(
    batch: RecordBatch,
    dest: jax.Array,
    count: jax.Array | None = None,
    cfg: EngineConfig = DEFAULT_CONFIG,
) -> RecordBatch:
    """Move row i to output position rank-of(dest[i]); dest values unique.

    With `count`, rows whose dest >= count are zeroed (the static-capacity
    padding convention).  cfg.materialize == "sort2d" routes through the
    replicated-key 2-D sort engine instead of grouped placement sorts.
    """
    if cfg.materialize == "sort2d":
        # P1 measurements: per-column sort cost grows with matrix width, so
        # split the payload into groups of ~4 columns (the measured optimum)
        words = batch.payload_words()
        placed = list(
            place_words_2d(dest, None, words, npay=-(-len(words) // 4))
        )
        out = RecordBatch.from_payload_words(placed)
        if count is not None:
            n = batch.nrows
            live = jnp.arange(n, dtype=jnp.int32) < count
            out = RecordBatch(
                recid=jnp.where(live, out.recid, 0),
                num=jnp.where(live, out.num, 0),
                strw=jnp.where(live[:, None], out.strw, 0),
                valid=out.valid & live,
            )
        return out
    # production path: valid folded into the placement key (r4, 6->5 ops)
    return place_batch(dest, count, batch)


def value_boundaries(d: jax.Array, nprobes: int) -> jax.Array:
    """``out[p] = #elements of d < p`` for p in [0, nprobes).

    The partition-pass counting primitive: ``jnp.searchsorted`` is
    scan-based on TPU (measured 137 ms at 2M x 255) while the
    broadcast-compare reduce below measures ~0.2 ms (PERF_NOTES r4,
    tools/bench_sort_ceiling2 S1).  ``d`` need not be sorted.  Per-part
    counts are ``jnp.diff(value_boundaries(d, nparts + 1))``.

    The broadcast form is O(n * nprobes); past ~1K probes (pod-scale
    shuffles, >8M-row tiled joins) a sort-based O((n+P) log) form takes
    over: probes ride the sort at key ``2p`` against data at ``2d+1``,
    so each probe lands exactly AFTER the data values below it — its
    sorted position minus its probe rank IS the boundary.
    """
    du = d.astype(jnp.uint32)
    if nprobes <= 1024:
        probes = jnp.arange(nprobes, dtype=jnp.uint32)
        return jnp.sum(
            (du[:, None] < probes[None, :]).astype(jnp.int32), axis=0
        )
    n = du.shape[0]
    dd = jnp.minimum(du, jnp.uint32(nprobes))  # clamp: sinks stay above
    keys = jnp.concatenate(
        [dd * 2 + 1, jnp.arange(nprobes, dtype=jnp.uint32) * 2]
    )
    flag = jnp.concatenate(
        [jnp.zeros(n, jnp.uint32), jnp.ones(nprobes, jnp.uint32)]
    )
    _, sflag = jax.lax.sort((keys, flag), num_keys=1)
    pos = jnp.arange(n + nprobes, dtype=jnp.int32)
    _, (ppos,) = compact_words(sflag == 1, (pos,))
    return ppos[:nprobes] - jnp.arange(nprobes, dtype=jnp.int32)


def stage_to_cells(
    dest: jax.Array,
    active: jax.Array,
    nparts: int,
    cap: int,
    payloads: list[jax.Array],
    row_map: str = "slots",
) -> tuple[list[jax.Array], jax.Array, jax.Array | None, jax.Array]:
    """Stage rows into padded [nparts, cap] cells by destination id.

    The device-side analogue of the external drivers' spill partitioning
    (and of the shuffle's slot pack): every active row with ``dest[i] <
    nparts`` lands at cell ``dest[i]``, rank-within-destination order,
    live rows packed to the FRONT of each cell.  No gathers/scatters —
    two small rank sorts plus grouped placeholder-pinned placement sorts.

    Returns ``(cells, counts, row_map_out, overflow)``: ``cells`` is one
    [nparts*cap] array per payload word (row-major by cell; dead slots
    zero-filled — liveness comes from ``counts``), ``counts`` the per-cell
    live counts clamped to cap, ``overflow`` the number of active rows
    that exceeded their cell's capacity (results for those rows are NOT
    staged; callers must detect and recover).  ``row_map`` selects the
    third output (r5 — each option below "slots" saves a 2-operand
    un-permute sort):

      "slots"  slot_of_row[i] = row i's flat slot (nparts*cap for
               dropped/inactive rows);
      "si"     the staging permutation itself: original row indices in
               (cell, arrival) order — which IS slot order as long as
               nothing overflowed (overflow rows interleave mid-cell, so
               callers must discard the attempt when overflow > 0);
      "none"   None.

    NOTE: ``parallel/overlap._partition_words_to_slots`` (U32_MAX filler,
    slot semantics for the exchange) and ``ops/bucket_join._bucket_table``
    (2-D table form, occupancy mask) are siblings of this trick with
    incompatible output contracts; a fix to the rank/placeholder core here
    should be cross-checked against both.
    """
    from .scan import seg_carry

    n = dest.shape[0]
    m = nparts * cap
    iota = jnp.arange(n, dtype=jnp.int32)
    d = jnp.where(active, dest.astype(jnp.uint32), jnp.uint32(nparts))
    # When the caller does not need slot_of_row, payloads (if few) RIDE
    # the rank sort, the placement keys by the sorted-order slots, and
    # the un-permute sort disappears entirely (r5: -1 full 2-op sort)
    fuse = row_map != "slots" and len(payloads) + 2 <= 1 + PLACE_GROUP
    if fuse:
        out = jax.lax.sort((d, iota) + tuple(payloads), num_keys=2)
        sd, si, spay = out[0], out[1], list(out[2:])
    else:
        sd, si = jax.lax.sort((d, iota), num_keys=2)
        spay = None
    is_start = jnp.concatenate([jnp.ones(1, bool), sd[1:] != sd[:-1]])
    start = seg_carry(
        is_start, jnp.where(is_start, iota, 0).astype(jnp.uint32)
    ).astype(jnp.int32)
    rank_sorted = iota - start
    ok_sorted = (sd < jnp.uint32(nparts)) & (rank_sorted < cap)
    slot_sorted = jnp.where(
        ok_sorted, sd.astype(jnp.int32) * cap + rank_sorted, m
    )
    overflow = jnp.sum(
        (sd < jnp.uint32(nparts)) & (rank_sorted >= cap), dtype=jnp.int32
    )
    counts = jnp.minimum(
        jnp.diff(value_boundaries(sd, nparts + 1)), cap
    )
    if fuse:
        row_map_out = si if row_map == "si" else None
        real_key = jnp.where(
            slot_sorted < m, 2 * slot_sorted, 2 * m + iota
        ).astype(jnp.uint32)
        pay_words = spay
    else:
        # slot back to original row order (si is a permutation)
        _, slot_of_row = jax.lax.sort((si, slot_sorted), num_keys=1)
        row_map_out = {
            "slots": slot_of_row, "si": si, "none": None,
        }[row_map]
        real_key = jnp.where(
            slot_of_row < m, 2 * slot_of_row, 2 * m + iota
        ).astype(jnp.uint32)
        pay_words = payloads

    # placeholder-pinned placement: real rows keyed 2*slot, placeholders pin
    # unoccupied slots at 2*slot+1, dropped rows sink past 2m
    j = jnp.arange(m, dtype=jnp.int32)
    # occupancy WITHOUT the per-slot `j % cap < counts[j // cap]` form:
    # integer div/mod by a non-power-of-2 cap expands to long VPU
    # sequences and the counts[] indexing is a 2M-row gather — the
    # reshape broadcast is pure compare traffic (r5 tiled-join profile)
    occupied = (
        jnp.arange(cap, dtype=jnp.int32)[None, :] < counts[:, None]
    ).reshape(m)
    ph_key = jnp.where(occupied, 2 * m + n + j, 2 * j + 1).astype(jnp.uint32)
    keys = jnp.concatenate([real_key, ph_key])
    cells: list[jax.Array] = []
    for base in range(0, len(pay_words), PLACE_GROUP):
        grp = pay_words[base : base + PLACE_GROUP]
        pay = tuple(
            jnp.concatenate([w, jnp.zeros((m,), w.dtype)]) for w in grp
        )
        out = jax.lax.sort((keys,) + pay, num_keys=1)
        cells.extend(o[:m] for o in out[1:])
    return cells, counts, row_map_out, overflow


def sort_words(
    key_words: list[jax.Array],
    payload: tuple[jax.Array, ...] = (),
    stable_iota: bool = True,
) -> tuple[tuple[jax.Array, ...], tuple[jax.Array, ...]]:
    """Sort key_words carrying word payload. Returns (sorted_keys, payload)."""
    n = key_words[0].shape[0]
    keys = [w.astype(jnp.uint32) for w in key_words]
    if stable_iota:
        keys = keys + [jnp.arange(n, dtype=jnp.int32)]
    out = jax.lax.sort(tuple(keys) + tuple(payload), num_keys=len(keys))
    nk = len(key_words)
    return tuple(out[:nk]), tuple(out[len(keys):])


def compact_words(
    keep: jax.Array, payload: tuple[jax.Array, ...]
) -> tuple[jax.Array, tuple[jax.Array, ...]]:
    """Word-level compaction: payload rows with keep=True to the front."""
    drop_w = (~keep).astype(jnp.uint32)
    _, out = sort_words([drop_w], payload)
    return jnp.sum(keep, dtype=jnp.int32), out


def compaction_dest(keep: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(dest, count): dest[i] = survivor rank if kept, else count + drop rank.

    dest is a dense permutation of [0, N): survivors to the front in order,
    drops after in order.
    """
    n = keep.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    from .scan import cumsum as _bcumsum

    ranks = _bcumsum(keep.astype(jnp.int32)) - 1  # kept rank at kept rows
    count = jnp.sum(keep, dtype=jnp.int32)
    dest = jnp.where(keep, ranks, count + (iota - ranks - 1))
    return dest, count


def compact_rows(
    batch: RecordBatch,
    keep: jax.Array,
    extra: tuple[jax.Array, ...] = (),
    cfg: EngineConfig = DEFAULT_CONFIG,
) -> tuple[RecordBatch, jax.Array, tuple[jax.Array, ...]]:
    """Keep-masked rows to the front, order preserved.

    Rows past `count` are zeroed.  Returns (batch, count, extras-compacted-
    alongside).  TPU: grouped payload-placement sorts; other backends: one
    word sort + one fused record gather.
    """
    n = batch.nrows
    iota = jnp.arange(n, dtype=jnp.int32)
    if use_sort_placement(cfg):
        dest, count = compaction_dest(keep)
        out = permute_rows(batch, dest, count=count, cfg=cfg)
        extras = tuple(place_words(dest, [e for e in extra])) if extra else ()
        return out, count, extras
    count, out = compact_words(keep, (iota,) + tuple(extra))
    orig = out[0]
    gather_idx = jnp.where(iota < count, orig, jnp.int32(n))
    return batch.take_fill(gather_idx), count, out[1:]
