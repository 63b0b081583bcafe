"""Composed query pipelines — the engine's "models".

The reference's full workload is the driver pipeline in ``main.cpp:109-123``:
MergeJoin (= sort → distinct → two-pointer join, ``DatabaseProject.cpp:384``)
followed by HashJoin on the dedup'd intermediates, cross-checking pair
counts.  BASELINE.json config 5 extends it to
filter → sort → hash join → hash aggregate across hosts.

Two compiled forms:

* ``pipeline_single``: the whole plan as ONE jitted XLA program with **late
  materialization** — every stage runs on key words, adjacency masks and
  scans (sort.SortedView); the selection filter is a mask (costs nothing);
  exactly ONE record gather materializes the join output.  On the target
  chip this is the difference between ~60 ms and ~350 ms at 1M rows
  (gathers are the only expensive primitive; see ops/movement.py).
* ``make_dist_pipeline``: the same plan as ONE ``jit(shard_map(...))``
  program over a device mesh — per-chip filter, a single hash-partition
  all-to-all per table (the engine's parallelism: data-parallel
  partitioning with collective exchange; a relational engine has no
  tensor/pipeline axes — the shuffle axis IS the scaling axis), then local
  kernels and psum'd counters.  This is the "training step" the multi-chip
  dry-run compiles.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..batch import RecordBatch
from ..config import DEFAULT_CONFIG, EngineConfig
from ..ops._jit import per_static_jit, resilient_jit
from ..ops.aggregate import group_aggregate_impl
from ..ops.distinct import distinct_impl, distinct_view
from ..ops.filter import compact
from ..ops.hash_join import hash_join_count_impl
from ..ops.keys import key_hash
from ..ops.merge_join import join_sorted_distinct_impl
from ..ops.movement import compact_words, sort_words
from ..ops.sort import sort_keys
from ..parallel.mesh import mesh_size
from ..parallel.shuffle import shuffle


def _mask_to_original_order(perm: jax.Array, mask_sorted: jax.Array) -> jax.Array:
    """Un-permute a sorted-order mask back to original row order (one sort)."""
    _, (m,) = sort_words([perm.astype(jnp.uint32)], (mask_sorted.astype(jnp.uint32),))
    return m == 1


def pipeline_single_impl(
    r: RecordBatch,
    s: RecordBatch,
    field: int = 1,
    cfg: EngineConfig = DEFAULT_CONFIG,
) -> dict:
    """Full single-chip plan, late-materialized; one XLA program.

    Returns the reference driver's counters plus the join output:
    nunique_r/s (EliminateDuplicates), merge_nres (MergeJoin), hash_nres
    (HashJoin on the dedup'd inputs — the driver's cross-check must equal
    merge_nres), agg_groups, and the merge-join output batch + count.
    """
    nr, ns = r.nrows, s.nrows

    # selection filter: the valid flag is the reference format's predicate
    # slot (dbtproj.h:24) — applied as an activity MASK, zero data movement
    r_act, s_act = r.valid, s.valid

    # sort + distinct both sides at the key level (EliminateDuplicates,
    # DatabaseProject.cpp:393-394)
    rv, rkeep = distinct_view(r, field, cfg, active=r_act)
    sv, skeep = distinct_view(s, field, cfg, active=s_act)
    nu_r = jnp.sum(rkeep, dtype=jnp.int32)
    nu_s = jnp.sum(skeep, dtype=jnp.int32)

    # survivor masks back in original row order (one tiny sort each)
    r_surv = _mask_to_original_order(rv.perm, rkeep)
    s_surv = _mask_to_original_order(sv.perm, skeep)

    # sorted-intersection join over the survivors (MergeJoin semantics):
    # concat → key sort → adjacent [R,S] pair detection
    both = RecordBatch.concat([r, s])
    idx = jnp.arange(nr + ns, dtype=jnp.int32)
    side = (idx >= nr).astype(jnp.uint32)
    active = jnp.concatenate([r_surv, s_surv])
    jview = sort_keys(
        both, field, cfg,
        pre_words=((~active).astype(jnp.uint32),),
        post_words=(side,),
        extra=(side, active.astype(jnp.uint32)),
    )
    j_side, j_act = jview.extras
    eq_next = jview.adj_eq[1:]
    pair = (
        eq_next
        & (j_side[:-1] == 0) & (j_side[1:] == 1)
        & (j_act[:-1] == 1) & (j_act[1:] == 1)
    )
    matched = jnp.concatenate([pair, jnp.zeros(1, dtype=bool)])
    mj_n = jnp.sum(matched, dtype=jnp.int32)

    # the ONE record materialization: emit matched R rows (R-capacity
    # output).  Matched rows are always R-side, so the placement path moves
    # only the R half (ops/movement.py grouped placement sorts); gather
    # backends take one fused record gather.
    from ..ops.movement import permute_rows, use_sort_placement
    from ..ops.sort import survivor_dest

    if use_sort_placement(cfg):
        dest, cnt = survivor_dest(jview.perm, matched)
        mj_out = permute_rows(r, dest[:nr], count=cnt)
    else:
        cnt, (orig_front,) = compact_words(matched, (jview.perm,))
        gather_idx = jnp.where(
            jnp.arange(nr, dtype=jnp.int32) < cnt, orig_front[:nr], jnp.int32(nr + ns)
        )
        mj_out = both.take_fill(gather_idx)

    # cross-check: hash semi-join count of the dedup'd S against the dedup'd
    # R build set (what main.cpp:121 actually runs), via the hash-join
    # engine's segmented-scan counting over the SAME sorted view (the sort
    # call was formerly duplicated verbatim and merely CSE'd away) — count S
    # survivors whose equal-key run head is an R survivor.
    from ..ops.scan import seg_carry

    is_start = ~jview.adj_eq
    head_is_build = is_start & (j_side == 0) & (j_act == 1)
    carry = seg_carry(is_start, head_is_build.astype(jnp.uint32))
    hj_n = jnp.sum(
        ((j_side == 1) & (j_act == 1) & (carry == 1)).astype(jnp.int32)
    )

    # hash aggregate over the (filtered) probe table — counters only
    _, aggs, n_groups = group_aggregate_impl(
        s, field, cfg, active=s_act, materialize_reps=False
    )

    return {
        "nunique_r": nu_r,
        "nunique_s": nu_s,
        "merge_nres": mj_n,
        "hash_nres": hj_n,
        "agg_groups": n_groups,
        "join_out": mj_out,
        "join_count": mj_n,
    }


pipeline_single = per_static_jit(pipeline_single_impl)


def make_dist_pipeline(mesh: Mesh, field: int = 1, cfg: EngineConfig = DEFAULT_CONFIG):
    """Build the jitted multi-chip pipeline step for `mesh`.

    Returned fn signature: (r_batch, r_counts, s_batch, s_counts) with rows
    sharded over the mesh; returns the same counter dict as pipeline_single
    (counters globally psum'd and replicated) plus shuffle overflow.
    """
    ndev = mesh_size(mesh)
    ax = mesh.axis_names if len(mesh.axis_names) > 1 else mesh.axis_names[0]
    row = P(mesh.axis_names)

    def step(rb, rc, sb, sc):
        rc, sc = rc[0], sc[0]
        nrow_r = rb.nrows
        nrow_s = sb.nrows
        cap_r = max(int(nrow_r * cfg.shuffle_slack) // ndev + 1, 64)
        cap_s = max(int(nrow_s * cfg.shuffle_slack) // ndev + 1, 64)

        # per-chip filter
        rf, rcf = compact(rb, rb.valid & (jnp.arange(nrow_r) < rc), cfg)
        sf, scf = compact(sb, sb.valid & (jnp.arange(nrow_s) < sc), cfg)

        # one hash-partition all-to-all per table: colocates equal keys
        rdest = key_hash(rf, field) % jnp.uint32(ndev)
        sdest = key_hash(sf, field) % jnp.uint32(ndev)
        rsh, rtot, ovf1 = shuffle(rf, rcf, rdest, ax, ndev, cap_r, cfg)
        ssh, stot, ovf2 = shuffle(sf, scf, sdest, ax, ndev, cap_s, cfg)

        # local kernels — identical to the single-chip path
        rd, nur = distinct_impl(rsh, field, cfg, count=rtot)
        sd, nus = distinct_impl(ssh, field, cfg, count=stot)
        mj_out, mjn = join_sorted_distinct_impl(rd, nur, sd, nus, field, cfg)
        _, _, hjn = hash_join_count_impl(
            rd, sd, field, cfg, build_count=nur, probe_count=nus
        )
        _, _, ng = group_aggregate_impl(
            ssh, field, cfg, count=stot, materialize_reps=False
        )

        return {
            "nunique_r": jax.lax.psum(nur, ax),
            "nunique_s": jax.lax.psum(nus, ax),
            "merge_nres": jax.lax.psum(mjn, ax),
            "hash_nres": jax.lax.psum(hjn, ax),
            "agg_groups": jax.lax.psum(ng, ax),
            "join_out": mj_out,
            "join_counts": mjn[None].astype(jnp.int32),
            "overflow": ovf1 + ovf2,
        }

    sharded = shard_map(
        step,
        mesh=mesh,
        in_specs=(row, row, row, row),
        out_specs={
            "nunique_r": P(),
            "nunique_s": P(),
            "merge_nres": P(),
            "hash_nres": P(),
            "agg_groups": P(),
            "join_out": row,
            "join_counts": row,
            "overflow": P(),
        },
        check_vma=False,
    )
    return resilient_jit(lambda: jax.jit(sharded))
