"""Exchange/compute-overlapped distributed hash join (key-only traffic).

SURVEY.md §2.3 / §7 M4: the north star's shuffle is "double-buffered async
copies overlapped with probe/merge compute".  The barrier form
(``dist_ops.dist_hash_join``) ships full 137-byte records both ways and
lands every byte before the first probe compare.

This variant restructures the semi-join so that ONLY KEYS cross the wire
(late materialization across the interconnect):

  1. build keys hash-partition to their owner chip (one all_to_all of u32
     words), where they become one sorted unique-key array;
  2. probe KEYS partition into per-destination slots locally, then exchange
     in ``nchunks`` independent all_to_all slices; chunk c's membership
     probe (vectorized binary search) consumes nothing from chunk c+1, so
     XLA's async collectives overlap chunk c+1's exchange with chunk c's
     compute (TPU; the CPU test backend runs the same program serially);
  3. each chunk's match mask rides an all_to_all BACK to the probe rows'
     source chip (tiled all_to_all block s returns to source s);
  4. matched probe rows are emitted LOCALLY — the 137-byte payload never
     crosses the interconnect at all (37 bytes/row -> 10 bytes/row moved).

Scope (r3): any key expressible as a SHORT u32 word list — '0'/'1'
(one word, the reference benchmark field, main.cpp:114) and, thanks to
narrow-width storage, '2'/'3' whenever both sides store 2 string words
(the stored prefix IS the whole NUL-normalized string, so the exchange
stays exact with zero verify passes).  Wide strings take the barrier
path.

Semantics preserved (reference HashJoin, DatabaseProject.cpp:504-647):
semi-join — matched probe rows, probe multiplicity kept, build collapsed to
a key set.  Output rows live on their SOURCE chip (the barrier form leaves
them on the key-owner chip); all cross-chip results are multiset-equal.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..batch import RecordBatch, canonical_field
from ..config import DEFAULT_CONFIG, EngineConfig
from ..ops._jit import resilient_jit
from ..ops.filter import compact
from ..ops.keys import key_hash
from .dist_ops import DistTable, _run_with_overflow_retry, _shuffle_cap
from .mesh import mesh_size
from .shuffle import _dest_ranks

U32_MAX = np.uint32(0xFFFFFFFF)


def overlap_key_words(batch: RecordBatch, field) -> list | None:
    """The full key as a SHORT u32 word list, or None if not expressible.

    r3: narrow-width storage makes short string keys exchangeable exactly —
    when the stored width is 2 words, those 2 words ARE the whole string
    (trailing words provably zero), so field '2' keys cross the wire as 2
    u32 planes and field '3' as 3, with zero verify passes.  Wider strings
    return None (callers take the barrier join).
    """
    f = canonical_field(field)
    if f == 0:
        return [batch.recid]
    if f == 1:
        return [batch.num]
    if batch.str_words != 2:
        return None
    sw = [batch.strw[:, 0], batch.strw[:, 1]]
    return sw if f == 2 else [batch.num] + sw


# Per-chunk build-multiplicity kernel: shared with the tiled over-budget
# join — see ops/hash_join.member_multiplicity (moved there in r4).
from ..ops.hash_join import member_multiplicity as _member_multiword


def _partition_words_to_slots(
    words: list, count: jax.Array, dest: jax.Array, ndev: int, cap: int
) -> tuple[list, jax.Array, jax.Array, jax.Array]:
    """Slot-pack a SHORT key-word list by destination (key-only partition).

    Returns (slots list of [ndev*cap] with U32_MAX filler, slot_of_row[n]
    (=m for dropped rows), counts[ndev], overflow).  Pure VPU + one tiny
    scatter-free placement: all key planes ride ONE placement sort.
    """
    n = words[0].shape[0]
    m = ndev * cap
    idx = jnp.arange(n, dtype=jnp.int32)
    valid = idx < count
    dest = jnp.where(valid, dest.astype(jnp.int32), ndev)
    counts, rank = _dest_ranks(dest, ndev)
    ok = (dest < ndev) & (rank < cap)
    slot = jnp.where(ok, dest * cap + rank, m)
    # build the slot array: real rows keyed 2*slot, placeholders pin the
    # unoccupied slots at 2*slot+1, everything else sinks past m
    real_key = jnp.where(ok, 2 * slot, 2 * m + idx).astype(jnp.uint32)
    j = jnp.arange(m, dtype=jnp.int32)
    occupied = (j % cap) < counts[j // cap]
    ph_key = jnp.where(occupied, 2 * m + n + j, 2 * j + 1).astype(jnp.uint32)
    keys = jnp.concatenate([real_key, ph_key])
    payload = tuple(
        jnp.concatenate([w, jnp.full((m,), U32_MAX, w.dtype)]) for w in words
    )
    out = jax.lax.sort((keys,) + payload, num_keys=1)
    placed = [o[:m] for o in out[1:]]
    send_counts = jnp.minimum(counts[:ndev], cap)
    overflow = jnp.sum(jnp.maximum(counts[:ndev] - cap, 0))
    return placed, slot, send_counts, overflow


def _overlapped_join_colocated(
    bb: RecordBatch,
    bc: jax.Array,
    pb: RecordBatch,
    pc: jax.Array,
    field,
    cfg: EngineConfig,
    ax,
    nw_b: list,
    nw_p: list,
    nchunks: int,
):
    """Colocated-input body: identical chunked membership probe, zero
    exchanges (every all_to_all would be an identity).  See
    overlapped_join_local(colocated=True)."""
    nw = len(nw_b)
    nb = bb.nrows
    pos_b = jnp.arange(nb, dtype=jnp.int32)
    live_b = pos_b < bc
    dead_w = (~live_b).astype(jnp.uint32)
    bsort = jax.lax.sort((dead_w,) + tuple(nw_b), num_keys=1 + nw)
    bkeys = [jnp.where(pos_b < bc, w, U32_MAX) for w in bsort[1:]]

    npr = pb.nrows
    chunk = -(-npr // max(nchunks, 1))
    m = chunk * max(nchunks, 1)
    pw = [
        jnp.concatenate([w, jnp.full((m - npr,), U32_MAX, w.dtype)])
        for w in nw_p
    ]
    live_all = jnp.arange(m, dtype=jnp.int32) < pc
    cnt_chunks = []
    for c in range(max(nchunks, 1)):
        sl = slice(c * chunk, (c + 1) * chunk)
        k = [w[sl] for w in pw]
        live_c = live_all[sl]
        if nw == 1:
            pos = jnp.searchsorted(bkeys[0], k[0])
            hit = (
                (pos < bc)
                & (jnp.take(bkeys[0], pos, mode="clip") == k[0])
                & live_c
            )
            cnts = hit.astype(jnp.uint32)
        else:
            cnts = _member_multiword(bkeys, bc, k, live_c)
        cnt_chunks.append(cnts)
    mult = jnp.concatenate(cnt_chunks)[:npr]
    matched = mult > 0

    out, nres_rows = compact(pb, matched, cfg)
    if canonical_field(field) == 3:
        nres = jax.lax.psum(jnp.sum(mult, dtype=jnp.int32), ax)
    else:
        nres = jax.lax.psum(nres_rows, ax)
    return out, nres_rows, nres, jnp.int32(0)


def overlapped_join_local(
    bb: RecordBatch,
    bc: jax.Array,
    pb: RecordBatch,
    pc: jax.Array,
    field,
    cfg: EngineConfig,
    ndev: int,
    ax,
    cap_b: int,
    cap_p: int,
    chunk_cap: int,
    nchunks: int,
    colocated: bool = False,
):
    """Per-chip body of the overlapped key-only semi-join (INSIDE shard_map).

    Exposed for composed plans (models/pipeline.make_dist_pipeline with
    dist_join_engine="overlap"); ``dist_hash_join_overlapped`` is the
    standalone wrapper.  Returns (probe_out, cnt, nres, overflow).

    ``colocated=True`` declares the inputs ALREADY hash-partitioned by key:
    all three exchanges (build keys out, probe keys out, mask back) would
    route every element to its own chip, so they are elided — the same
    chunked membership probe runs against the local build key set, and the
    cap_* slot sizing (which would otherwise cost ndev*(nrow+slack) rows
    per chip just to self-route) is bypassed entirely (ADVICE r3 #2).
    """
    a2a = lambda x: jax.lax.all_to_all(x, ax, 0, 0, tiled=True)
    nw_b = overlap_key_words(bb, field)
    nw_p = overlap_key_words(pb, field)
    assert nw_b is not None and nw_p is not None and len(nw_b) == len(nw_p), (
        "overlapped join needs short-word keys on both sides; "
        "use dist_hash_join for wide strings"
    )
    nw = len(nw_b)

    if colocated:
        return _overlapped_join_colocated(
            bb, bc, pb, pc, field, cfg, ax, nw_b, nw_p, nchunks
        )

    # ---- build: key-only shuffle, one sorted unique key array ----
    bdest = key_hash(bb, field) % jnp.uint32(ndev)
    bslots, _, bcounts, bovf = _partition_words_to_slots(
        nw_b, bc, bdest, ndev, cap_b
    )
    bkey_recv = [a2a(s) for s in bslots]
    brc = a2a(bcounts)
    pos_b = jnp.arange(ndev * cap_b, dtype=jnp.int32)
    live_b = (pos_b % cap_b) < brc[pos_b // cap_b]
    dead_w = (~live_b).astype(jnp.uint32)
    bsort = jax.lax.sort((dead_w,) + tuple(bkey_recv), num_keys=1 + nw)
    n_bkeys = jnp.sum(live_b, dtype=jnp.int32)
    bkeys = [jnp.where(pos_b < n_bkeys, w, U32_MAX) for w in bsort[1:]]

    # ---- probe: key slots once, exchange + probe + mask-return in
    # nchunks independent slices (compute overlaps neighbours' comms)
    pdest = key_hash(pb, field) % jnp.uint32(ndev)
    pslots, slot_of_row, pcounts, povf = _partition_words_to_slots(
        nw_p, pc, pdest, ndev, cap_p
    )
    prc = a2a(pcounts)
    within_c = jnp.arange(ndev * chunk_cap, dtype=jnp.int32) % chunk_cap
    src_c = jnp.arange(ndev * chunk_cap, dtype=jnp.int32) // chunk_cap

    mask_slot_chunks = []
    for c in range(nchunks):
        lo = c * chunk_cap
        k_recv = [
            a2a(
                s.reshape(ndev, cap_p)[:, lo : lo + chunk_cap].reshape(
                    ndev * chunk_cap
                )
            )
            for s in pslots
        ]
        live_c = (lo + within_c) < prc[src_c]
        if nw == 1:
            pos = jnp.searchsorted(bkeys[0], k_recv[0])
            hit = (
                (pos < n_bkeys)
                & (jnp.take(bkeys[0], pos, mode="clip") == k_recv[0])
                & live_c
            )
            cnts = hit.astype(jnp.uint32)
        else:
            cnts = _member_multiword(bkeys, n_bkeys, k_recv, live_c)
        # multiplicity rides BACK to the probe rows' source chip: tiled
        # all_to_all returns block s to source s
        mask_slot_chunks.append(a2a(cnts))

    # stitch chunk masks back into slot order [ndev, cap_p]
    mask_slots = jnp.stack(
        [m.reshape(ndev, chunk_cap) for m in mask_slot_chunks], axis=1
    ).reshape(ndev, cap_p)  # [d, c*chunk_cap + w] = chunk c's block d
    mask_flat = jnp.concatenate(
        [jnp.reshape(mask_slots, (ndev * cap_p,)), jnp.zeros(1, jnp.uint32)]
    )
    # back to original row order: each row knows its slot (dropped
    # rows got the sentinel slot -> mask 0)
    slot_idx = jnp.minimum(slot_of_row, ndev * cap_p)
    mult = jnp.take(mask_flat, slot_idx)
    matched = mult > 0

    # ---- emit locally: the payload never crossed the wire ------------
    # nres follows the reference counter: matched probe rows for fields
    # 0-2 (mult is 0/1 — the build side dedups on the owner chip for
    # single-word keys and counts are 1 per distinct key), build-side
    # multiplicity summed for field '3' (the multimap semantics)
    out, nres_rows = compact(pb, matched, cfg)
    if canonical_field(field) == 3:
        nres = jax.lax.psum(jnp.sum(mult, dtype=jnp.int32), ax)
    else:
        nres = jax.lax.psum(nres_rows, ax)
    return out, nres_rows, nres, jax.lax.psum(bovf + povf, ax)


def dist_hash_join_overlapped(
    mesh: Mesh,
    build: DistTable,
    probe: DistTable,
    field,
    cfg: EngineConfig = DEFAULT_CONFIG,
    nchunks: int = 4,
    stats=None,
) -> tuple[DistTable, jax.Array, jax.Array]:
    """Overlapped, key-only-traffic distributed semi-join (u32 fields).

    Returns (probe_out, nres, overflow); output rows stay on their source
    chip (multiset-equal to ``dist_hash_join``)."""
    field = canonical_field(field)
    kb = overlap_key_words(build.batch, field)
    kp = overlap_key_words(probe.batch, field)
    assert kb is not None and kp is not None and len(kb) == len(kp), (
        "overlapped join needs short-word keys on both sides (u32 fields, "
        "or string fields at narrow stored width); use dist_hash_join"
    )
    ndev = mesh_size(mesh)
    per_b, per_p = build.rows_per_chip, probe.rows_per_chip
    ax = mesh.axis_names if len(mesh.axis_names) > 1 else mesh.axis_names[0]
    row = P(mesh.axis_names)

    def run(cap_scale):
        cap_b = min(_shuffle_cap(per_b, ndev, cfg) * cap_scale, max(per_b, 1))
        cap_p0 = min(_shuffle_cap(per_p, ndev, cfg) * cap_scale, max(per_p, 1))
        chunk_cap = -(-cap_p0 // nchunks)
        cap_p = chunk_cap * nchunks

        @functools.partial(
            shard_map,
            mesh=mesh,
            in_specs=(row, row, row, row),
            out_specs=(row, row, P(), P()),
            check_vma=False,
        )
        def step(bb, bc, pb, pc):
            out, cnt, nres, ovf = overlapped_join_local(
                bb, bc[0], pb, pc[0], field, cfg, ndev, ax,
                cap_b, cap_p, chunk_cap, nchunks,
            )
            return out, cnt[None].astype(jnp.int32), nres, ovf

        out, counts, nres, ovf = resilient_jit(lambda: jax.jit(step))(
            build.batch, build.count, probe.batch, probe.count
        )
        return (out, counts, nres), ovf

    (out, counts, nres), ovf = _run_with_overflow_retry(
        run, 1, max(per_b, per_p), max_retries=6, stats=stats
    )
    if stats is not None:
        # key-only traffic: each exchanged key is len(kb) u32 word planes
        # (1 for fields 0/1, 2-3 for narrow string fields); the returning
        # match mask stays one word per probe key (vs 137 B/row barrier)
        nw = len(kb)
        b = (per_b * nw + per_p * nw + per_p) * ndev * 4
        stats.rows_in += (per_b + per_p) * ndev
        stats.nres = int(nres)
        stats.bytes_ici += b
        if "host" in mesh.axis_names:
            stats.bytes_dcn += b
    return DistTable(batch=out, count=counts), nres, ovf
