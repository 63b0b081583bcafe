"""Heavy-hitter (skew) handling for the distributed hash join.

BASELINE.json config 4: Zipf-keyed joins melt a pure hash-partition — every
probe row of a hot key lands on one chip (recv overflow + compute imbalance;
SURVEY.md §7 hard part #3).  The fix exploits semi-join semantics
(build side is a key *set*, DatabaseProject.cpp:510-540):

1. detect: per-chip group counts on the probe side → local top-k candidate
   key hashes + counts → all_gather → a key is *hot* if its summed count
   exceeds rows/(ndev · hh_factor).  Any globally-hot key is locally hot on
   at least one chip, so the union of local top-ks contains every global
   heavy hitter.
2. route by hash, consistently on both sides: hot-hash build rows are
   locally deduped, compacted and **all-gathered** (replicated — they are
   few keys); hot-hash probe rows **stay local** and probe the replicated
   set.  Cold rows take the normal hash-partition shuffle.  A cold key whose
   hash collides with a hot hash simply rides the broadcast path on both
   sides — still exact, since membership tests compare full keys.

Fields 0-2 (set-semantics build).  Field 3 needs build multiplicities and
falls back to the plain shuffle join (Zipf configs join on num).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..batch import RecordBatch
from ..config import DEFAULT_CONFIG, EngineConfig
from ..ops.distinct import distinct_impl
from ..ops.filter import compact
from ..ops.hash_join import hash_join_count_impl
from ..ops.keys import key_hash
from .dist_ops import DistTable, _shuffle_cap
from .mesh import mesh_size
from .shuffle import shuffle


def local_topk_hashes(
    hashes: jax.Array, active: jax.Array, k: int
) -> tuple[jax.Array, jax.Array]:
    """Top-k (hash, count) among active rows, via sort + segment counts.

    k clamps to the per-chip row count (lax.top_k errors on k > n — tiny
    tables over many chips, r4 review); callers pad with sentinels so a
    shorter candidate list stays well-formed."""
    n = hashes.shape[0]
    k = min(k, n)
    h = jnp.where(active, hashes, jnp.uint32(0xFFFFFFFF))
    hs = jax.lax.sort(h)
    new_run = jnp.concatenate(
        [jnp.ones(1, bool), hs[1:] != hs[:-1]]
    ) & (jnp.arange(n) < jnp.sum(active))
    seg = jnp.cumsum(new_run.astype(jnp.int32)) - 1
    counts = jnp.zeros(n, jnp.int32).at[seg].add(
        (jnp.arange(n) < jnp.sum(active)).astype(jnp.int32)
    )
    run_counts = jnp.where(new_run, counts[seg], 0)
    top_counts, top_pos = jax.lax.top_k(run_counts, k)
    return hs[top_pos], top_counts


def hot_hash_set(
    hashes: jax.Array,
    active: jax.Array,
    axis,
    k: int,
    threshold: jax.Array,
) -> jax.Array:
    """Global hot-hash list (ndev*k,), padded with 0xFFFFFFFF sentinels.

    Deterministic across chips: built from an all_gather every chip sees
    identically.
    """
    lh, lc = local_topk_hashes(hashes, active, k)
    gh = jax.lax.all_gather(lh, axis, tiled=True)  # (ndev*k,)
    gc = jax.lax.all_gather(lc, axis, tiled=True)
    # sum counts per distinct hash within the candidate set
    eq = gh[:, None] == gh[None, :]
    tot = jnp.sum(jnp.where(eq, gc[None, :], 0), axis=1)
    is_first = jnp.argmax(eq, axis=1) == jnp.arange(gh.shape[0])
    hot = is_first & (tot > threshold) & (gh != jnp.uint32(0xFFFFFFFF))
    return jnp.where(hot, gh, jnp.uint32(0xFFFFFFFF))


def in_hash_set(hashes: jax.Array, hot: jax.Array) -> jax.Array:
    """bool[N]: row hash appears in the hot list (sentinels never match)."""
    return jnp.any(
        (hashes[:, None] == hot[None, :]) & (hot[None, :] != jnp.uint32(0xFFFFFFFF)),
        axis=1,
    )


def skew_join_local(
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
    cap_hot: int,
    colocated: bool = False,
):
    """Per-chip body of the skew-resistant semi-join (runs INSIDE shard_map).

    Exposed separately so composed plans (models/pipeline.make_dist_pipeline
    with dist_join_engine="skew") can fuse it into one program with the rest
    of the pipeline; ``dist_hash_join_skew`` is the standalone wrapper.
    Returns (probe_out, cnt, nres, overflow, n_hot) — per-chip probe_out/cnt,
    psum'd scalars.

    ``colocated=True`` declares the inputs ALREADY hash-partitioned by key
    (every row's shuffle destination is its own chip): the cold-path
    exchange is then an identity and is skipped, keeping per-chip buffers
    at nrow instead of the ndev*(nrow+slack) a routed-to-self shuffle
    would allocate (the composed pipeline's cross-check case).
    """
    nb, npr = bb.nrows, pb.nrows
    b_active = jnp.arange(nb) < bc
    p_active = jnp.arange(npr) < pc
    bh = key_hash(bb, field)
    ph = key_hash(pb, field)

    total_probe = jax.lax.psum(pc, ax)
    threshold = jnp.maximum(
        total_probe // (ndev * cfg.hh_factor), 1
    ).astype(jnp.int32)
    hot_p = hot_hash_set(ph, p_active, ax, cfg.hh_topk, threshold)
    # build-side heavy hitters too: a key with many duplicate BUILD rows
    # (cold probe) would otherwise funnel every duplicate to one chip's
    # cap_b; routing it down the hot path dedups locally first (semi-join
    # build is a key set) so only one row per key per chip is gathered
    total_build = jax.lax.psum(bc, ax)
    threshold_b = jnp.maximum(
        total_build // (ndev * cfg.hh_factor), 1
    ).astype(jnp.int32)
    hot_b = hot_hash_set(bh, b_active, ax, cfg.hh_topk, threshold_b)
    hot = jnp.concatenate([hot_p, hot_b])
    n_hot = jnp.sum(hot != jnp.uint32(0xFFFFFFFF))

    b_hot = in_hash_set(bh, hot) & b_active
    p_hot = in_hash_set(ph, hot) & p_active

    # --- hot path: replicate hot build rows, probe locally ------------
    bhot_rows, bhot_n = compact(bb, b_hot, cfg)
    # semi-join build is a key set: local dedup bounds the per-chip hot
    # contribution to (#hot keys) <= ndev*topk <= cap_hot, so the
    # broadcast can never overflow under build-side skew either
    bhot_rows, bhot_n = distinct_impl(bhot_rows, field, cfg, count=bhot_n)
    bhot_slice = bhot_rows.slice(0, min(cap_hot, bhot_rows.nrows))
    hot_ovf = jnp.maximum(bhot_n - cap_hot, 0)
    gathered = RecordBatch(
        recid=jax.lax.all_gather(bhot_slice.recid, ax, tiled=True),
        num=jax.lax.all_gather(bhot_slice.num, ax, tiled=True),
        strw=jax.lax.all_gather(bhot_slice.strw, ax, tiled=True),
        valid=jax.lax.all_gather(bhot_slice.valid, ax, tiled=True),
    )
    # per-source live counts -> global active mask after gather
    gcounts = jax.lax.all_gather(
        jnp.minimum(bhot_n, cap_hot)[None], ax, tiled=True
    )  # (ndev,)
    gidx = jnp.arange(ndev * cap_hot)
    g_active = (gidx % cap_hot) < gcounts[gidx // cap_hot]
    ghot, gn = compact(gathered, g_active, cfg)
    matched_hot, _, _ = hash_join_count_impl(
        ghot, pb, field, cfg, build_count=gn,
        probe_count=None,
    )
    matched_hot = matched_hot & p_hot  # only hot probe rows use this path

    # --- cold path: normal hash-partition shuffle ---------------------
    bcold, bcold_n = compact(bb, b_active & ~b_hot, cfg)
    pcold, pcold_n = compact(pb, p_active & ~p_hot, cfg)
    # remember original probe index through shuffle? not needed: matched
    # cold rows are emitted on the destination chip.
    if colocated:
        # equal keys already share a chip: the shuffle would route every
        # row to itself — skip it (exact, and O(ndev) less buffer memory)
        brecv, btot, ovf1 = bcold, bcold_n, jnp.int32(0)
        precv, ptot, ovf2 = pcold, pcold_n, jnp.int32(0)
    else:
        bdest = key_hash(bcold, field) % jnp.uint32(ndev)
        pdest = key_hash(pcold, field) % jnp.uint32(ndev)
        brecv, btot, ovf1 = shuffle(bcold, bcold_n, bdest, ax, ndev, cap_b, cfg)
        precv, ptot, ovf2 = shuffle(pcold, pcold_n, pdest, ax, ndev, cap_p, cfg)
    matched_cold, _, _ = hash_join_count_impl(
        brecv, precv, field, cfg, build_count=btot, probe_count=ptot
    )

    # --- combine ------------------------------------------------------
    hot_out, hot_cnt = compact(pb, matched_hot, cfg)
    cold_out, cold_cnt = compact(precv, matched_cold, cfg)
    out = RecordBatch.concat([hot_out, cold_out])
    # compact the concatenation: hot block then cold block
    keep = jnp.concatenate(
        [
            jnp.arange(hot_out.nrows) < hot_cnt,
            jnp.arange(cold_out.nrows) < cold_cnt,
        ]
    )
    out, cnt = compact(out, keep, cfg)
    nres = jax.lax.psum(hot_cnt + cold_cnt, ax)
    ovf = ovf1 + ovf2 + jax.lax.psum(hot_ovf, ax)
    return out, cnt[None].astype(jnp.int32), nres, ovf, n_hot


def dist_hash_join_skew(
    mesh: Mesh,
    build: DistTable,
    probe: DistTable,
    field,
    cfg: EngineConfig = DEFAULT_CONFIG,
) -> tuple[DistTable, jax.Array, jax.Array, jax.Array]:
    """Skew-resistant distributed semi-join (fields 0-2).

    Returns (probe_out, nres, overflow, n_hot): matched probe rows stay on
    the chip that joined them (hot rows never move; cold rows joined where
    the shuffle sent them).
    """
    ndev = mesh_size(mesh)
    ax = mesh.axis_names if len(mesh.axis_names) > 1 else mesh.axis_names[0]
    row = P(mesh.axis_names)
    per_b, per_p = build.rows_per_chip, probe.rows_per_chip
    cap_b = _shuffle_cap(per_b, ndev, cfg)
    cap_p = _shuffle_cap(per_p, ndev, cfg)
    # hot build capacity: hot keys are few (<= ndev*topk), but each chip may
    # hold several build rows per hot key pre-gather (build not pre-deduped)
    # hot list = probe-side + build-side candidates (2 * ndev * topk hashes);
    # after local dedup each chip contributes at most one row per hot key
    cap_hot = min(max(2 * ndev * cfg.hh_topk, 64), per_b)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(row, row, row, row),
        out_specs=(row, row, P(), P(), P()),
        check_vma=False,
    )
    def step(bb, bc, pb, pc):
        # skew_join_local already returns cnt shaped (1,) per chip — the
        # shard_map row spec concatenates to a uniform (ndev,) DistTable.count
        out, cnt, nres, ovf, n_hot = skew_join_local(
            bb, bc[0], pb, pc[0], field, cfg, ndev, ax, cap_b, cap_p, cap_hot
        )
        return out, cnt, nres, ovf, n_hot

    from ..ops._jit import resilient_jit

    out, counts, nres, ovf, n_hot = resilient_jit(lambda: jax.jit(step))(
        build.batch, build.count, probe.batch, probe.count
    )
    return DistTable(batch=out, count=counts), nres, ovf, n_hot
