"""Bucketed build/probe semi-join for u32 keys (the Grace-hash analogue).

The reference's HashJoin streams probe records through an in-memory hash
table (``DatabaseProject.cpp:504-647``).  The literal translation (open
addressing + gather probes, ops/hash_table.py) measures ~300x slower on
this TPU because random gathers dominate; this module is the TPU-native
form of the same *structure*: hash-partition both key sets into B buckets,
stage each bucket's build keys as one padded row of a [B, cap_b] table —
small enough that XLA keeps the compare tiles VMEM-resident — and resolve
every probe against ONLY its bucket row with a fused broadcast-compare +
any-reduce on the VPU (no gathers, no scatters, no per-probe loop).

Exactness under static shapes: bucket capacities are compile-time; a
data-adversarial bucket overflow (astronomically unlikely at the default
slack — counts are ~Binomial(n, 1/B)) is *detected* and the whole call
falls back to the generic sort-based engine via ``lax.cond``, so results
are exact for every input (the pattern the shuffle uses for its capacity
contract, parallel/shuffle.py).

Measured honestly in PERF_NOTES.md: this engine beats the probe-side
binary-search path but the concat-sort "generic" engine remains the
default on this chip — XLA's variadic sort is simply the fastest grouping
primitive available (the same finding as the materializer study).  The
engine is kept dispatched (cfg.u32_join_engine = "bucketed") and
equality-tested against all other engines, and is the design point that
wins wherever bucket compares outrun wide sorts (GPU backends, future
Mosaic fusions).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .movement import value_boundaries

from ..batch import RecordBatch, canonical_field
from ..config import DEFAULT_CONFIG, EngineConfig
from .keys import hash_words
from .scan import seg_carry

# mean build keys per bucket; cap = _BUCKET_SLACK * mean (power of two)
_TARGET_MEAN = 16
_BUCKET_SLACK = 8


def _bucket_layout(n_rows: int) -> tuple[int, int, int]:
    """Bucket count/capacity for the LARGER side: sizing from build alone
    guarantees probe-side overflow (and a silent always-fallback engine)
    whenever mean probe keys per bucket = _TARGET_MEAN * n_probe / n_build
    exceeds the capacity — so callers pass max(n_build, n_probe)."""
    b = 1
    while b * _TARGET_MEAN < max(n_rows, 1):
        b *= 2
    cap_b = _BUCKET_SLACK * _TARGET_MEAN
    return b, cap_b, b * cap_b


def _bucket_table(
    key: jax.Array, active: jax.Array, nbuckets: int, cap: int
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Stage active keys into a [nbuckets, cap] padded table (U32_MAX fill).

    Returns (table, occupancy_mask, overflow).  One 3-operand
    sort computes bucket-major order + per-bucket ranks; one 2-operand
    placement sort builds the padded table (placeholder-pinned slots, the
    shuffle's slot trick) — no gathers/scatters.
    """
    n = key.shape[0]
    m = nbuckets * cap
    sentinel = jnp.uint32(0xFFFFFFFF)
    h = hash_words([key])
    bucket = jnp.where(active, h & jnp.uint32(nbuckets - 1), jnp.uint32(nbuckets))
    iota = jnp.arange(n, dtype=jnp.int32)
    # bucket-major stable order; rank within bucket from run starts
    sb, sk, si = jax.lax.sort((bucket, key, iota), num_keys=3)
    is_start = jnp.concatenate([jnp.ones(1, bool), sb[1:] != sb[:-1]])
    start_pos = seg_carry(is_start, jnp.where(is_start, iota, 0).astype(jnp.uint32))
    rank_sorted = iota - start_pos.astype(jnp.int32)
    ok = (sb < nbuckets) & (rank_sorted < cap)
    slot_sorted = sb.astype(jnp.int32) * cap + rank_sorted
    overflow = jnp.sum((sb < nbuckets) & (rank_sorted >= cap), dtype=jnp.int32)
    # placement into padded slots: real keys at 2*slot, placeholders pin
    # unoccupied slots at 2*slot+1, the rest sink
    real_key = jnp.where(ok, 2 * slot_sorted, 2 * m + iota).astype(jnp.uint32)
    j = jnp.arange(m, dtype=jnp.int32)
    # occupied iff rank < count(bucket): count = searchsorted over sb runs
    counts = jnp.diff(value_boundaries(sb, nbuckets + 1))
    occupied = (
        jnp.arange(cap, dtype=jnp.int32)[None, :] < counts[:, None]
    ).reshape(m)
    ph_key = jnp.where(occupied, 2 * m + n + j, 2 * j + 1).astype(jnp.uint32)
    keys2 = jnp.concatenate([real_key, ph_key])
    pay = jnp.concatenate([sk, jnp.full((m,), sentinel, jnp.uint32)])
    placed = jax.lax.sort((keys2, pay), num_keys=1)[1][:m]
    table = jnp.where(occupied, placed, sentinel).reshape(nbuckets, cap)
    occ = occupied.reshape(nbuckets, cap)
    return table, occ, overflow


def _bucketed_matched(
    bkey: jax.Array,
    b_active: jax.Array,
    pkey: jax.Array,
    p_active: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """(matched bool[P] in probe order, overflow count)."""
    npr = pkey.shape[0]
    nbuckets, cap_b, _ = _bucket_layout(max(int(bkey.shape[0]), npr))
    table, table_occ, ovf_b = _bucket_table(bkey, b_active, nbuckets, cap_b)

    # probe side: bucket-major order, then compare each probe key against
    # its bucket's row — [B, cap_p] vs [B, 1, cap_b] fused on the VPU
    h = hash_words([pkey])
    bucket = jnp.where(
        p_active, h & jnp.uint32(nbuckets - 1), jnp.uint32(nbuckets)
    )
    iota = jnp.arange(npr, dtype=jnp.int32)
    sb, sk, si = jax.lax.sort((bucket, pkey, iota), num_keys=3)
    is_start = jnp.concatenate([jnp.ones(1, bool), sb[1:] != sb[:-1]])
    start_pos = seg_carry(is_start, jnp.where(is_start, iota, 0).astype(jnp.uint32))
    rank_sorted = iota - start_pos.astype(jnp.int32)
    cap_p = cap_b  # same slack model on the probe side
    ok = (sb < nbuckets) & (rank_sorted < cap_p)
    ovf_p = jnp.sum((sb < nbuckets) & (rank_sorted >= cap_p), dtype=jnp.int32)
    m = nbuckets * cap_p
    slot_sorted = sb.astype(jnp.int32) * cap_p + rank_sorted
    real_key = jnp.where(ok, 2 * slot_sorted, 2 * m + iota).astype(jnp.uint32)
    j = jnp.arange(m, dtype=jnp.int32)
    counts = jnp.diff(value_boundaries(sb, nbuckets + 1))
    occupied = (
        jnp.arange(cap_p, dtype=jnp.int32)[None, :] < counts[:, None]
    ).reshape(m)
    ph_key = jnp.where(occupied, 2 * m + npr + j, 2 * j + 1).astype(jnp.uint32)
    keys2 = jnp.concatenate([real_key, ph_key])
    pay_key = jnp.concatenate([sk, jnp.zeros((m,), jnp.uint32)])
    pay_idx = jnp.concatenate([si, jnp.full((m,), npr, jnp.int32)])
    _, pk_slots, pi_slots = jax.lax.sort(
        (keys2, pay_key, pay_idx), num_keys=1
    )
    pk_slots = pk_slots[:m].reshape(nbuckets, cap_p)
    pi_slots = pi_slots[:m]
    occ2 = occupied.reshape(nbuckets, cap_p)

    # THE probe: every probe key vs its bucket's cap_b build keys, fused;
    # unoccupied build slots are masked (a real key may equal the sentinel)
    hit = jnp.any(
        (pk_slots[:, :, None] == table[:, None, :]) & table_occ[:, None, :],
        axis=-1,
    ) & occ2  # [B, cap_p]

    # mask back to probe order: sort (orig_idx, hit) — padding rows carry
    # idx = npr and sink past the live range
    _, mask_sorted = jax.lax.sort(
        (pi_slots, hit.reshape(-1).astype(jnp.uint32)), num_keys=1
    )
    matched = (mask_sorted[:npr] == 1) & p_active
    return matched, ovf_b + ovf_p


def hash_join_count_bucketed(
    build: RecordBatch,
    probe: RecordBatch,
    field,
    cfg: EngineConfig = DEFAULT_CONFIG,
    build_count: jax.Array | None = None,
    probe_count: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Engine entry: same contract as hash_join_count_impl (fields 0/1)."""
    field = canonical_field(field)
    assert field in (0, 1), "bucketed engine covers u32 key fields"
    nb, npr = build.nrows, probe.nrows
    bkey = build.recid if field == 0 else build.num
    pkey = probe.recid if field == 0 else probe.num
    # engine convention (shared with generic/searchsorted/table): `count`
    # marks live rows; the valid flag is the filter stage's business
    b_active = (
        jnp.ones(nb, bool)
        if build_count is None
        else jnp.arange(nb, dtype=jnp.int32) < build_count
    )
    p_active = (
        jnp.ones(npr, bool)
        if probe_count is None
        else jnp.arange(npr, dtype=jnp.int32) < probe_count
    )

    matched, ovf = _bucketed_matched(bkey, b_active, pkey, p_active)

    def fallback(_):
        # adversarial bucket overflow: exactness first — generic engine
        import dataclasses

        from .hash_join import build_key_multiset, probe_multiplicity

        gcfg = dataclasses.replace(cfg, u32_join_engine="generic")
        uniq, counts, n_build = build_key_multiset(
            build, field, gcfg, count=build_count
        )
        m2, _ = probe_multiplicity(
            uniq, counts, n_build, probe, field, gcfg, probe_count=probe_count
        )
        return m2

    matched = jax.lax.cond(ovf > 0, fallback, lambda _: matched, None)
    mult = matched.astype(jnp.int32)
    return matched, mult, jnp.sum(mult)
