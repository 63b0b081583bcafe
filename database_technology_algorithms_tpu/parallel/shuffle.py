"""Hash/range-partitioned all-to-all shuffle — the engine's data plane.

The reference's inter-phase data plane is named segment files on local disk
(``DatabaseProject.cpp:653-657``; SURVEY.md §5 "distributed communication
backend: absent").  Here it is an XLA collective: each chip buckets its rows
by destination (key hash for join/distinct/aggregate, splitter range for
sort), packs them into fixed-capacity per-destination slots, and a single
``lax.all_to_all`` exchanges the buckets over ICI (intra-host axis) / DCN
(host axis).  Static shapes everywhere: capacities are compile-time, true
counts ride alongside, overflow is *detected* (returned as a count) rather
than silently dropped — callers size ``shuffle_slack`` or pre-split heavy
hitters (skew.py) so it stays zero.

All functions in this module run *inside* ``shard_map`` (they take the mesh
axis name and use per-chip views).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..batch import RecordBatch
from ..config import DEFAULT_CONFIG, EngineConfig
from ..ops.movement import place_words, use_sort_placement

Axis = str | tuple[str, ...]


# Above this device count the sort-based rank engine takes over: the one-hot
# cumsum materializes an [n, ndev+1] i32 intermediate (O(n*ndev) HBM traffic
# — ~1 GB per shuffle at 1M rows x 256 chips), while the sort form stays
# O(n log n) with two cheap 2-3 operand sorts regardless of mesh size.
SORT_RANK_MIN_NDEV = 16


def _dest_ranks(
    dest: jax.Array, ndev: int, engine: str = "auto"
) -> tuple[jax.Array, jax.Array]:
    """(counts[ndev+1], rank[n]): per-destination totals and each row's
    arrival rank within its destination.  dest values must be in [0, ndev].

    engine: "onehot" (VPU cumsum, best at small meshes), "sort" (two small
    word sorts, pod-scale), "auto" (threshold on ndev).  Both engines are
    exact and deterministic; tests assert equality.
    """
    n = dest.shape[0]
    if n == 0:
        return jnp.zeros(ndev + 1, jnp.int32), jnp.zeros(0, jnp.int32)
    if engine == "auto":
        engine = "sort" if ndev + 1 > SORT_RANK_MIN_NDEV else "onehot"
    if engine == "onehot":
        onehot = dest[:, None] == jnp.arange(ndev + 1, dtype=dest.dtype)[None, :]
        run = jnp.cumsum(onehot.astype(jnp.int32), axis=0)
        counts = run[-1]
        rank = jnp.sum(jnp.where(onehot, run, 0), axis=1) - 1
        return counts, rank
    if engine != "sort":
        raise ValueError(f"unknown rank engine {engine!r}")
    iota = jnp.arange(n, dtype=jnp.int32)
    d32 = dest.astype(jnp.uint32)
    # stable group-by-destination: within a destination, rows keep arrival
    # order (iota is the tie-break), so rank = sorted position - run start
    sdest, sidx = jax.lax.sort((d32, iota), num_keys=2)
    is_start = jnp.concatenate([jnp.ones(1, bool), sdest[1:] != sdest[:-1]])
    from ..ops.scan import seg_carry

    start_pos = seg_carry(is_start, jnp.where(is_start, iota, 0).astype(jnp.uint32))
    rank_sorted = iota - start_pos.astype(jnp.int32)
    # un-permute: sorting by the original index restores arrival order
    _, rank = jax.lax.sort((sidx, rank_sorted), num_keys=1)
    from ..ops.movement import value_boundaries

    counts = jnp.diff(value_boundaries(sdest, ndev + 2))
    return counts, rank


def partition_to_slots(
    batch: RecordBatch,
    count: jax.Array,
    dest: jax.Array,
    ndev: int,
    cap: int,
    cfg: EngineConfig = DEFAULT_CONFIG,
    extra: tuple = (),
) -> tuple[RecordBatch, tuple, jax.Array, jax.Array]:
    """Pack rows into (ndev*cap)-row send slots grouped by destination.

    Rows beyond `count` and rows overflowing a destination's `cap` go
    nowhere; overflow is returned so callers can assert/resplit.  `extra`
    u32 word columns (e.g. partial-aggregate values) ride the same slots.
    Returns (send_batch[ndev*cap], send_extra, send_counts[ndev], overflow).

    TPU path: slot-pinned placement sort — real rows keyed 2*slot, one
    placeholder per *unoccupied* slot keyed 2*slot+1, everything else sunk
    past the live region; sorting n+m rows and slicing the first m yields
    exactly the slot layout with zero gathers/scatters.  Gather backends
    keep the argsort + take + scatter form.
    """
    n = batch.nrows
    m = ndev * cap
    idx = jnp.arange(n, dtype=jnp.int32)
    valid = idx < count
    dest = jnp.where(valid, dest.astype(jnp.int32), ndev)
    nx = len(extra)

    if use_sort_placement(cfg):
        counts, rank = _dest_ranks(dest, ndev, cfg.shuffle_rank_engine)
        ok = (dest < ndev) & (rank < cap)
        slot = dest * cap + rank
        real_key = jnp.where(
            ok, 2 * slot, 2 * m + idx
        ).astype(jnp.uint32)
        # placeholder j pins slot j when unoccupied; occupied slots sink it
        j = jnp.arange(m, dtype=jnp.int32)
        occupied = (j % cap) < counts[j // cap]
        ph_key = jnp.where(occupied, 2 * m + n + j, 2 * j + 1).astype(jnp.uint32)
        keys = jnp.concatenate([real_key, ph_key])
        words = [
            jnp.concatenate([w, jnp.zeros((m,), w.dtype)])
            for w in batch.payload_words() + list(extra)
        ]
        placed = place_words(keys, words)
        nw = len(batch.payload_words())
        send = RecordBatch.from_payload_words([w[:m] for w in placed[:nw]])
        send_extra = tuple(w[:m] for w in placed[nw:])
        # zero the unoccupied slots (placeholders carry zero payload already,
        # but their valid bit must be False — from_payload_words casts 0 ok)
    else:
        starts = jnp.concatenate(
            [jnp.zeros(1, jnp.int32),
             jnp.cumsum(jnp.zeros(ndev + 1, jnp.int32).at[dest].add(1))[:-1]]
        )
        counts = jnp.zeros(ndev + 1, dtype=jnp.int32).at[dest].add(1)
        perm = jnp.argsort(dest, stable=True)
        sdest = dest[perm]
        rank = idx - starts[sdest]
        ok = (sdest < ndev) & (rank < cap)
        slot = jnp.where(ok, sdest * cap + rank, m)
        src = batch.take(perm)

        def scatter(col):
            out_shape = (m,) + col.shape[1:]
            return jnp.zeros(out_shape, col.dtype).at[slot].set(col, mode="drop")

        send = RecordBatch(
            recid=scatter(src.recid),
            num=scatter(src.num),
            strw=scatter(src.strw),
            valid=scatter(src.valid),
        )
        send_extra = tuple(scatter(e[perm]) for e in extra)
    send_counts = jnp.minimum(counts[:ndev], cap)
    overflow = jnp.sum(jnp.maximum(counts[:ndev] - cap, 0))
    return send, send_extra, send_counts, overflow


def exchange(
    send: RecordBatch,
    send_counts: jax.Array,
    axis: Axis,
    cap: int,
    cfg: EngineConfig = DEFAULT_CONFIG,
    extra: tuple = (),
    nchunks: int = 1,
) -> tuple[RecordBatch, tuple, jax.Array, jax.Array]:
    """all_to_all the slot buffers; compact received rows to the front.

    ``nchunks`` > 1 splits every column's slot buffer into that many
    independent all_to_all slices (each moving a cap/nchunks sub-range of
    every destination's slots).  The slices carry no data dependencies on
    each other, so XLA schedules them as independent async collectives and
    overlaps later slices' communication with earlier slices' unpack
    compute — the SURVEY §2.3 double-buffered exchange, expressed at the
    XLA level (see also parallel/overlap.py for the key-only variant).

    Returns (recv_batch[ndev*cap], recv_extra, recv_total, recv_counts).
    """
    ndev_l = send_counts.shape[0]
    nchunks = max(1, min(nchunks, cap))
    ccap = -(-cap // nchunks)

    def a2a(x):
        if nchunks == 1:
            return jax.lax.all_to_all(x, axis, 0, 0, tiled=True)
        # [ndev, cap] view; slice cap into nchunks independent exchanges
        x2 = x.reshape((ndev_l, cap) + x.shape[1:])
        parts = []
        for c in range(nchunks):
            sl = x2[:, c * ccap : min((c + 1) * ccap, cap)]
            flat = sl.reshape((-1,) + x.shape[1:])
            parts.append(
                jax.lax.all_to_all(flat, axis, 0, 0, tiled=True).reshape(
                    (ndev_l, -1) + x.shape[1:]
                )
            )
        return jnp.concatenate(parts, axis=1).reshape(x.shape)

    recv = RecordBatch(
        recid=a2a(send.recid),
        num=a2a(send.num),
        strw=a2a(send.strw),
        valid=a2a(send.valid),
    )
    recv_extra = tuple(a2a(e) for e in extra)
    recv_counts = jax.lax.all_to_all(
        send_counts, axis, 0, 0, tiled=True
    )  # (ndev,): rows from each source chip
    ndev = recv_counts.shape[0]
    within = jnp.arange(ndev * cap, dtype=jnp.int32) % cap
    chunk = jnp.arange(ndev * cap, dtype=jnp.int32) // cap
    mask = within < recv_counts[chunk]
    from ..ops.movement import compact_rows

    out, total, out_extra = compact_rows(recv, mask, extra=recv_extra, cfg=cfg)
    return out, out_extra, total, recv_counts


def shuffle(
    batch: RecordBatch,
    count: jax.Array,
    dest: jax.Array,
    axis: Axis,
    ndev: int,
    cap: int,
    cfg: EngineConfig = DEFAULT_CONFIG,
) -> tuple[RecordBatch, jax.Array, jax.Array]:
    """Full shuffle: partition → all_to_all → compact.

    Returns (recv_batch[ndev*cap], recv_count, overflow).
    """
    send, _, send_counts, overflow = partition_to_slots(
        batch, count, dest, ndev, cap, cfg
    )
    out, _, total, _ = exchange(send, send_counts, axis, cap, cfg)
    # surface global overflow so any chip's overflow fails the whole step
    overflow = jax.lax.psum(overflow, axis)
    return out, total, overflow


def shuffle_with_extra(
    batch: RecordBatch,
    count: jax.Array,
    dest: jax.Array,
    axis: Axis,
    ndev: int,
    cap: int,
    cfg: EngineConfig = DEFAULT_CONFIG,
    extra: tuple = (),
    nchunks: int = 1,
) -> tuple[RecordBatch, tuple, jax.Array, jax.Array]:
    """Shuffle with rider word columns (partial aggregates) and optional
    chunked (overlapped) exchange.  Returns (recv, extra, count, overflow)."""
    send, send_extra, send_counts, overflow = partition_to_slots(
        batch, count, dest, ndev, cap, cfg, extra=extra
    )
    out, out_extra, total, _ = exchange(
        send, send_counts, axis, cap, cfg, extra=send_extra, nchunks=nchunks
    )
    overflow = jax.lax.psum(overflow, axis)
    return out, out_extra, total, overflow
