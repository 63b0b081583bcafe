"""Composed query pipelines — the engine's "models".

The reference's full workload is the driver pipeline in ``main.cpp:109-123``:
MergeJoin (= sort → distinct → two-pointer join, ``DatabaseProject.cpp:384``)
followed by HashJoin on the dedup'd intermediates, cross-checking pair
counts.  BASELINE.json config 5 extends it to
filter → sort → hash join → hash aggregate across hosts.

Two compiled forms:

* ``pipeline_single``: the whole plan as ONE jitted XLA program on one chip
  (filter → distinct both sides → sorted-intersection join → raw hash join →
  group aggregate), returning every counter the reference driver prints.
* ``make_dist_pipeline``: the same plan as ONE ``jit(shard_map(...))``
  program over a device mesh — per-chip filter, a single hash-partition
  all-to-all per table (the engine's parallelism: data-parallel partitioning
  with collective exchange; there is no tensor/pipeline dimension in a
  relational engine — the shuffle axis IS the scaling axis), then local
  kernels and psum'd counters.  This is the "training step" the multi-chip
  dry-run compiles.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..batch import RecordBatch
from ..config import DEFAULT_CONFIG, EngineConfig
from ..ops.aggregate import group_aggregate_impl
from ..ops.distinct import distinct_impl
from ..ops.filter import compact
from ..ops.hash_join import hash_join_count_impl
from ..ops.keys import key_hash
from ..ops.merge_join import join_sorted_distinct_impl
from ..ops._jit import resilient_jit
from ..parallel.mesh import mesh_size
from ..parallel.shuffle import shuffle


def pipeline_single_impl(
    r: RecordBatch,
    s: RecordBatch,
    field: int = 1,
    cfg: EngineConfig = DEFAULT_CONFIG,
) -> dict:
    """Full single-chip plan; one XLA program.

    Returns the reference driver's counters plus the join outputs:
    nunique_r/s (EliminateDuplicates), merge_nres (MergeJoin), hash_nres
    (HashJoin on dedup'd inputs — the driver's cross-check must equal
    merge_nres), agg_groups, and the merge-join output batch + count.
    """
    # selection filter: the valid flag is the reference format's predicate
    # slot (dbtproj.h:24); real predicates compose via ops.filter
    rf, rc = compact(r, r.valid)
    sf, sc = compact(s, s.valid)

    # sort + distinct (EliminateDuplicates on both inputs,
    # DatabaseProject.cpp:393-394)
    rd, nu_r = distinct_impl(rf, field, cfg, count=rc)
    sd, nu_s = distinct_impl(sf, field, cfg, count=sc)

    # sorted-intersection join (MergeJoin semantics)
    mj_out, mj_n = join_sorted_distinct_impl(rd, nu_r, sd, nu_s, field, cfg)

    # hash join on the dedup'd inputs (what main.cpp:121 actually runs)
    _, _, hj_n = hash_join_count_impl(
        rd, sd, field, cfg, build_count=nu_r, probe_count=nu_s
    )

    # hash aggregate over the probe table (BASELINE config 5 tail)
    _, aggs, n_groups = group_aggregate_impl(sf, field, cfg, count=sc)

    return {
        "nunique_r": nu_r,
        "nunique_s": nu_s,
        "merge_nres": mj_n,
        "hash_nres": hj_n,
        "agg_groups": n_groups,
        "join_out": mj_out,
        "join_count": mj_n,
    }


from ..ops._jit import per_static_jit

pipeline_single = per_static_jit(pipeline_single_impl)


def make_dist_pipeline(mesh: Mesh, field: int = 1, cfg: EngineConfig = DEFAULT_CONFIG):
    """Build the jitted multi-chip pipeline step for `mesh`.

    Returned fn signature: (r_batch, r_counts, s_batch, s_counts) with rows
    sharded over the mesh; returns the same counter dict as pipeline_single
    (counters are globally psum'd and replicated) plus shuffle overflow.
    """
    ndev = mesh_size(mesh)
    ax = mesh.axis_names if len(mesh.axis_names) > 1 else mesh.axis_names[0]
    row = P(mesh.axis_names)

    def step(rb, rc, sb, sc):
        rc, sc = rc[0], sc[0]
        nrow_r = rb.nrows
        nrow_s = sb.nrows
        cap_r = max(int(nrow_r * cfg.shuffle_slack) // ndev + 1, 8)
        cap_s = max(int(nrow_s * cfg.shuffle_slack) // ndev + 1, 8)

        # per-chip filter
        rf, rcf = compact(rb, rb.valid & (jnp.arange(nrow_r) < rc))
        sf, scf = compact(sb, sb.valid & (jnp.arange(nrow_s) < sc))

        # one hash-partition all-to-all per table: colocates equal keys
        rdest = key_hash(rf, field) % jnp.uint32(ndev)
        sdest = key_hash(sf, field) % jnp.uint32(ndev)
        rsh, rtot, ovf1 = shuffle(rf, rcf, rdest, ax, ndev, cap_r)
        ssh, stot, ovf2 = shuffle(sf, scf, sdest, ax, ndev, cap_s)

        # local kernels — identical to the single-chip path
        rd, nur = distinct_impl(rsh, field, cfg, count=rtot)
        sd, nus = distinct_impl(ssh, field, cfg, count=stot)
        mj_out, mjn = join_sorted_distinct_impl(rd, nur, sd, nus, field, cfg)
        _, _, hjn = hash_join_count_impl(
            rd, sd, field, cfg, build_count=nur, probe_count=nus
        )
        _, _, ng = group_aggregate_impl(ssh, field, cfg, count=stot)

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
