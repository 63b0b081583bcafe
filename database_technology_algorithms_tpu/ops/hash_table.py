"""Vectorized open-addressing hash set (u32 keys) — build once, probe as a
pure gather stream.

The reference's hash join builds an STL ``unordered_map`` per query
(``DatabaseProject.cpp:510-548``) and probes per record through pointer
chains.  The TPU form: a power-of-two slot array in HBM, **parallel
insertion** by iterated scatter (winner-takes-slot, losers advance with
linear probing — the standard GPU/TPU data-parallel hashing construction),
and a probe phase that is nothing but hash → gather → compare, repeated for
the few rows that collide.  All loops are ``lax.while_loop`` with
whole-array masks: no data-dependent shapes, bounded by ``max_probe``.

Compared to the searchsorted path (fastpath.py) this avoids the O(log n)
gather chain per probe: expected probes ≈ 1/(1-load) with load 0.5.
``hash_join.py`` keeps both; benchmarks pick the winner per size.

Unlike the reference, memory is **bounded and explicit** (the reference's
table ignores nmem_blocks entirely — unbounded heap, SURVEY.md §2 C7): the
table size is a function of the build count and the configured load factor.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..batch import RecordBatch
from ..config import DEFAULT_CONFIG, EngineConfig
from .fastpath import u32_key

EMPTY = np.uint32(0xFFFFFFFF)  # empty-slot marker (keys == EMPTY re-hash)


def _mix(h: jax.Array) -> jax.Array:
    """murmur3 finalizer — full-avalanche u32 -> u32 (bijective)."""
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    return h


def table_size_for(n_build: int, cfg: EngineConfig = DEFAULT_CONFIG) -> int:
    want = max(int(n_build) * cfg.hash_load_factor_inv, 16)
    return 1 << max(int(want - 1).bit_length(), 4)


def build_hash_set(
    keys: jax.Array,
    size: int,
    count: jax.Array | None = None,
    max_iters: int = 64,
) -> tuple[jax.Array, jax.Array]:
    """Insert keys (first `count` live) into a size-slot table.

    Returns (table, n_failed): n_failed > 0 means some keys exhausted
    max_iters (pathological clustering); callers must fall back.

    Parallel insertion: every pending key scatters itself at its current
    slot; one writer per slot wins (XLA scatter picks one); losers whose
    slot now holds a *different* key advance and retry.  Keys equal to the
    slot's winner are dedup'd for free (semi-join set semantics).
    A key equal to the EMPTY sentinel is stored remapped (bijective mix), so
    the full u32 domain is supported.
    """
    n = keys.shape[0]
    mask = jnp.uint32(size - 1)
    stored = _mix(keys.astype(jnp.uint32))  # bijective => equality preserved
    live = (
        jnp.ones(n, dtype=bool)
        if count is None
        else jnp.arange(n, dtype=jnp.int32) < count
    )
    # avoid storing the EMPTY pattern itself: remap it (still bijective on
    # the used subset because only EMPTY maps to EMPTY^1 ... documented rare
    # double-mapping is resolved by the probe applying the same remap)
    stored = jnp.where(stored == EMPTY, EMPTY ^ jnp.uint32(1), stored)
    slot0 = stored & mask
    table = jnp.full(size, EMPTY, dtype=jnp.uint32)

    def cond(state):
        _, pending, _, i = state
        return jnp.any(pending) & (i < max_iters)

    def body(state):
        table, pending, slot, i = state
        # read-check-write: only EMPTY slots may be written, so a landed
        # entry can never be overwritten by a later round (lost-key hazard)
        cur = jnp.take(table, slot)
        dup = pending & (cur == stored)  # my key already there (duplicate)
        occupied = pending & ~dup & (cur != EMPTY)  # someone else: advance
        attempt = pending & ~dup & ~occupied
        table = table.at[jnp.where(attempt, slot, size)].set(stored, mode="drop")
        now = jnp.take(table, slot)
        won = attempt & (now == stored)
        pending = pending & ~dup & ~won
        slot = jnp.where(pending, (slot + 1) & mask, slot)
        return table, pending, slot, i + 1

    table, pending, _, _ = jax.lax.while_loop(
        cond, body, (table, live, slot0, jnp.int32(0))
    )
    return table, jnp.sum(pending.astype(jnp.int32))


def probe_hash_set(
    table: jax.Array,
    keys: jax.Array,
    count: jax.Array | None = None,
    max_probe: int = 64,
) -> jax.Array:
    """bool[N]: key present in the table (first `count` rows live)."""
    n = keys.shape[0]
    size = table.shape[0]
    mask = jnp.uint32(size - 1)
    q = _mix(keys.astype(jnp.uint32))
    q = jnp.where(q == EMPTY, EMPTY ^ jnp.uint32(1), q)
    slot0 = q & mask
    live = (
        jnp.ones(n, dtype=bool)
        if count is None
        else jnp.arange(n, dtype=jnp.int32) < count
    )

    def cond(state):
        active, _, _, i = state
        return jnp.any(active) & (i < max_probe)

    def body(state):
        active, found, slot, i = state
        cur = jnp.take(table, slot)
        hit = cur == q
        empty = cur == EMPTY
        found = found | (active & hit)
        active = active & ~hit & ~empty
        slot = jnp.where(active, (slot + 1) & mask, slot)
        return active, found, slot, i + 1

    _, found, _, _ = jax.lax.while_loop(
        cond,
        body,
        (live, jnp.zeros(n, dtype=bool), slot0, jnp.int32(0)),
    )
    return found


def hash_join_count_table(
    build: RecordBatch,
    probe: RecordBatch,
    field,
    cfg: EngineConfig = DEFAULT_CONFIG,
    build_count: jax.Array | None = None,
    probe_count: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """hash_join_count contract via the open-addressing table (u32 fields)."""
    from .fastpath import hash_join_count_u32

    bkey = u32_key(build, field)
    size = table_size_for(build.nrows, cfg)
    table, n_failed = build_hash_set(bkey, size, count=build_count)

    def table_path(_):
        hit = probe_hash_set(
            table, u32_key(probe, field), count=probe_count,
            max_probe=cfg.hash_max_probe,
        )
        mult = hit.astype(jnp.int32)
        return hit, mult, jnp.sum(mult)

    def fallback(_):
        # insertion exhausted max_iters (pathological clustering): use the
        # exact searchsorted membership path instead
        return hash_join_count_u32(
            build, probe, field, build_count=build_count, probe_count=probe_count
        )

    return jax.lax.cond(n_failed > 0, fallback, table_path, None)
