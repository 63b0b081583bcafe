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
from ..ops.filter import compact

Axis = str | tuple[str, ...]


def _axis_size(axis: Axis) -> jax.Array:
    return jax.lax.axis_size(axis)


def partition_to_slots(
    batch: RecordBatch,
    count: jax.Array,
    dest: jax.Array,
    ndev: int,
    cap: int,
) -> tuple[RecordBatch, jax.Array, jax.Array]:
    """Pack rows into (ndev*cap)-row send slots grouped by destination.

    Rows beyond `count` and rows overflowing a destination's `cap` go
    nowhere; overflow is returned so callers can assert/resplit.
    Returns (send_batch[ndev*cap], send_counts[ndev], overflow).
    """
    n = batch.nrows
    idx = jnp.arange(n, dtype=jnp.int32)
    valid = idx < count
    dest = jnp.where(valid, dest.astype(jnp.int32), ndev)

    counts = jnp.zeros(ndev + 1, dtype=jnp.int32).at[dest].add(1)
    starts = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(counts)[:-1].astype(jnp.int32)]
    )
    perm = jnp.argsort(dest, stable=True)
    sdest = dest[perm]
    rank = idx - starts[sdest]
    ok = (sdest < ndev) & (rank < cap)
    slot = jnp.where(ok, sdest * cap + rank, ndev * cap)

    src = batch.take(perm)

    def scatter(col):
        out_shape = (ndev * cap,) + col.shape[1:]
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
    send: RecordBatch, send_counts: jax.Array, axis: Axis, cap: int
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
    out, total = compact(recv, mask)
    return out, total, recv_counts


def shuffle(
    batch: RecordBatch,
    count: jax.Array,
    dest: jax.Array,
    axis: Axis,
    ndev: int,
    cap: int,
) -> tuple[RecordBatch, jax.Array, jax.Array]:
    """Full shuffle: partition → all_to_all → compact.

    Returns (recv_batch[ndev*cap], recv_count, overflow).
    """
    send, send_counts, overflow = partition_to_slots(batch, count, dest, ndev, cap)
    out, total, _ = exchange(send, send_counts, axis, cap)
    # surface global overflow so any chip's overflow fails the whole step
    overflow = jax.lax.psum(overflow, axis)
    return out, total, overflow
