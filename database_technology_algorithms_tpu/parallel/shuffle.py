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
from ..ops.filter import compact
from ..ops.movement import place_words, use_sort_placement

Axis = str | tuple[str, ...]


def _axis_size(axis: Axis) -> jax.Array:
    return jax.lax.axis_size(axis)


def _dest_ranks(dest: jax.Array, ndev: int) -> tuple[jax.Array, jax.Array]:
    """(counts[ndev+1], rank[n]): per-destination totals and each row's
    arrival rank within its destination — pure VPU (one-hot cumsum), no
    sorts/scatters.  dest values must be in [0, ndev]."""
    onehot = dest[:, None] == jnp.arange(ndev + 1, dtype=dest.dtype)[None, :]
    run = jnp.cumsum(onehot.astype(jnp.int32), axis=0)
    counts = run[-1] if dest.shape[0] else jnp.zeros(ndev + 1, jnp.int32)
    rank = jnp.sum(jnp.where(onehot, run, 0), axis=1) - 1
    return counts, rank


def partition_to_slots(
    batch: RecordBatch,
    count: jax.Array,
    dest: jax.Array,
    ndev: int,
    cap: int,
    cfg: EngineConfig = DEFAULT_CONFIG,
) -> tuple[RecordBatch, jax.Array, jax.Array]:
    """Pack rows into (ndev*cap)-row send slots grouped by destination.

    Rows beyond `count` and rows overflowing a destination's `cap` go
    nowhere; overflow is returned so callers can assert/resplit.
    Returns (send_batch[ndev*cap], send_counts[ndev], overflow).

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

    if use_sort_placement(cfg):
        counts, rank = _dest_ranks(dest, ndev)
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
            for w in batch.payload_words()
        ]
        placed = place_words(keys, words)
        send = RecordBatch.from_payload_words([w[:m] for w in placed])
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
    send_counts = jnp.minimum(counts[:ndev], cap)
    overflow = jnp.sum(jnp.maximum(counts[:ndev] - cap, 0))
    return send, send_counts, overflow


def exchange(
    send: RecordBatch,
    send_counts: jax.Array,
    axis: Axis,
    cap: int,
    cfg: EngineConfig = DEFAULT_CONFIG,
) -> tuple[RecordBatch, jax.Array, jax.Array]:
    """all_to_all the slot buffers; compact received rows to the front.

    Returns (recv_batch[ndev*cap], recv_total, recv_counts[ndev]).
    """
    a2a = lambda x: jax.lax.all_to_all(x, axis, 0, 0, tiled=True)
    recv = RecordBatch(
        recid=a2a(send.recid),
        num=a2a(send.num),
        strw=a2a(send.strw),
        valid=a2a(send.valid),
    )
    recv_counts = a2a(send_counts)  # (ndev,): rows from each source chip
    ndev = recv_counts.shape[0]
    within = jnp.arange(ndev * cap, dtype=jnp.int32) % cap
    chunk = jnp.arange(ndev * cap, dtype=jnp.int32) // cap
    mask = within < recv_counts[chunk]
    out, total = compact(recv, mask, cfg)
    return out, total, recv_counts


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
    send, send_counts, overflow = partition_to_slots(
        batch, count, dest, ndev, cap, cfg
    )
    out, total, _ = exchange(send, send_counts, axis, cap, cfg)
    # surface global overflow so any chip's overflow fails the whole step
    overflow = jax.lax.psum(overflow, axis)
    return out, total, overflow
