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
from ..ops.distinct import distinct_impl
from ..ops.filter import compact
from ..ops.hash_join import hash_join_count_impl
from ..ops.merge_join import join_sorted_distinct_impl
from ..ops.keys import key_hash, key_words
from ..ops.movement import compact_words
from ..ops.sort import SortedView, sort_keys
from ..parallel.mesh import mesh_size
from ..parallel.shuffle import shuffle


def _pipeline_view(both: RecordBatch, nr: int, field: int, cfg: EngineConfig):
    """The pipeline's ONE fused sort, at minimal operand count.

    Two operand savings over the round-1 form (each lax.sort operand costs
    ~0.36 ms/M rows on the target chip):

    * ``side`` is neither a sort word nor payload: the original row index —
      already the final stability key — is monotone in side (R rows occupy
      [0, nr)), so sorting by (inactive, key, iota) alone yields
      actives-first, by key, R-before-S-within-key, deterministic; the
      sorted side word is recomputed as ``perm >= nr``.
    * for int-keyed fields the sorted pre/key words double as the activity
      mask and the num column, so the sort carries ZERO payload words —
      field '1' runs 3 operands total (vs 7 in round 1, ~2.9 ms saved at
      2M rows).

    Returns (view, adj, is_r, is_s, prev_side, v_num).
    """
    from ..batch import canonical_field

    field = canonical_field(field)
    n = both.nrows
    active = both.valid
    inact = (~active).astype(jnp.uint32)
    iota = jnp.arange(n, dtype=jnp.int32)
    if field in (0, 1):
        kw = key_words(both, field)  # (recid,) or (num,)
        extra = () if field == 1 else (both.num,)
        if cfg.packed_u32_sorts:
            # 2-operand bit-packed form of the same order (r4, ~1.25x)
            from ..ops.sort import packed_u32_view_sort

            s_key, perm, v_act, ex = packed_u32_view_sort(inact, kw[0], extra)
            v_num = s_key if field == 1 else ex[0]
        else:
            out = jax.lax.sort((inact, kw[0], iota) + extra, num_keys=3)
            s_inact, s_key, perm = out[0], out[1], out[2]
            v_num = s_key if field == 1 else out[3]
            v_act = s_inact == 0
        adj = jnp.concatenate([jnp.zeros(1, bool), s_key[1:] == s_key[:-1]])
        view = SortedView(perm=perm, adj_eq=adj, extras=())
    else:
        view = sort_keys(
            both, field, cfg,
            pre_words=(inact,),
            extra=(active.astype(jnp.uint32), both.num),
        )
        v_act_w, v_num = view.extras
        v_act = v_act_w == 1
        adj = view.adj_eq
        perm = view.perm
    v_side = (perm >= nr).astype(jnp.uint32)
    is_r = v_act & (v_side == 0)
    is_s = v_act & (v_side == 1)
    prev_side = jnp.concatenate([jnp.zeros(1, jnp.uint32), v_side[:-1]])
    return view, adj, is_r, is_s, prev_side, v_num


def pipeline_single_impl(
    r: RecordBatch,
    s: RecordBatch,
    field: int = 1,
    cfg: EngineConfig = DEFAULT_CONFIG,
) -> dict:
    """Full single-chip plan from ONE fused key sort; one XLA program.

    Round-1 ran five key sorts (distinct views per side, two mask
    un-permutes, a join sort, an aggregate sort); measured sort cost on the
    target chip is ~0.36 ms per operand word per 1M rows and 15-65 s of
    compile per distinct sort shape (tools/bench_calibrate3.py), so the
    restructure derives EVERYTHING — both sides' distinct counts, the
    merge-join pair set, the hash-join cross-check, and the group
    aggregates — from a single sort of R||S by (valid, key, side) plus VPU
    scans.  Row movement happens exactly once, materializing the join
    output (placement sorts on TPU, one fused gather elsewhere).

    Returns the reference driver's counters plus the join output:
    nunique_r/s (EliminateDuplicates), merge_nres (MergeJoin), hash_nres
    (HashJoin on the dedup'd inputs — the driver's cross-check must equal
    merge_nres), agg_groups + per-group aggregates, and the merge-join
    output batch + count.
    """
    from ..ops.scan import seg_carry, seg_max, seg_min

    from ..utils.checks import ensure_device_budget

    nr, ns = r.nrows, s.nrows
    n = nr + ns
    # jit-safe MONOLITH: the trace-time gate stays.  The host-level form
    # with over-budget routing is make_pipeline_staged(...)(r, s), whose
    # runner composes the unbounded ops when r+s exceed the budget.
    ensure_device_budget(n, cfg, "pipeline_single")

    # selection filter: the valid flag is the reference format's predicate
    # slot (dbtproj.h:24) — applied as an activity MASK, zero data movement
    both = RecordBatch.concat([r, s])

    # THE sort: actives first, by key, R before S within a key, stable
    view, adj, is_r, is_s, prev_side, v_num = _pipeline_view(
        both, nr, field, cfg
    )

    # distinct firsts (EliminateDuplicates, DatabaseProject.cpp:94-170):
    # actives form a prefix and R precedes S within each key run, so the
    # first R of a run sits at the run start and the first S follows the
    # last R (or starts the run)
    r_first = is_r & ~adj
    s_first = is_s & ~(adj & (prev_side == 1))
    nu_r = jnp.sum(r_first, dtype=jnp.int32)
    nu_s = jnp.sum(s_first, dtype=jnp.int32)

    # run-level intersection (MergeJoin = distinct-key intersection,
    # DatabaseProject.cpp:384-502): a key matches iff its run has an active
    # R head AND any active S
    is_start = ~adj
    run_has_r = seg_carry(is_start, r_first.astype(jnp.uint32)) == 1
    # any active S at-or-after each row within its run: reverse seg-max
    end_flags = jnp.concatenate([is_start[1:], jnp.ones(1, bool)])
    any_s_suffix = jnp.flip(
        seg_max(jnp.flip(end_flags), jnp.flip(is_s.astype(jnp.uint32)))
    ) == 1
    matched = r_first & any_s_suffix  # the matched R survivor of each key
    mj_n = jnp.sum(matched, dtype=jnp.int32)

    # hash-join cross-check (main.cpp:121 runs HashJoin on the dedup'd
    # files): count distinct S keys whose run is headed by an R survivor
    hj_n = jnp.sum((s_first & run_has_r).astype(jnp.int32))

    # group aggregates over the filtered S side (BASELINE config 5's hash
    # aggregate), same view: S rows of a key are contiguous
    nxt_adj = jnp.concatenate([adj[1:], jnp.zeros(1, bool)])
    nxt_is_s = jnp.concatenate([is_s[1:], jnp.zeros(1, bool)])
    s_end = is_s & ~(nxt_adj & nxt_is_s)
    from ..ops.scan import cumsum as _bcumsum

    c_incl = _bcumsum(is_s.astype(jnp.int32))
    s_incl = _bcumsum(jnp.where(is_s, v_num, 0).astype(jnp.uint32))
    run_min = seg_min(s_first, jnp.where(is_s, v_num, jnp.uint32(0xFFFFFFFF)))
    run_max = seg_max(s_first, jnp.where(is_s, v_num, jnp.uint32(0)))
    _, (ec, es, emin, emax) = compact_words(s_end, (c_incl, s_incl, run_min, run_max))
    gidx = jnp.arange(n, dtype=jnp.int32)
    live_g = gidx < nu_s
    prev_c = jnp.concatenate([jnp.zeros(1, jnp.int32), ec[:-1]])
    prev_s = jnp.concatenate([jnp.zeros(1, jnp.uint32), es[:-1]])
    aggs = {
        "count": jnp.where(live_g, ec - prev_c, 0)[:ns],
        "sum": jnp.where(live_g, es - prev_s, 0)[:ns],
        "min": jnp.where(live_g, emin, jnp.uint32(0xFFFFFFFF))[:ns],
        "max": jnp.where(live_g, emax, 0)[:ns],
    }

    # the ONE record materialization: emit matched R rows in key order
    # (R-capacity output).  Matched rows are always R-side, so the
    # placement path moves only the R half (ops/movement.py grouped
    # placement sorts); gather backends take one fused record gather.
    from ..ops.movement import permute_rows, use_sort_placement
    from ..ops.sort import survivor_dest

    if use_sort_placement(cfg):
        dest, cnt = survivor_dest(view.perm, matched)
        mj_out = permute_rows(r, dest[:nr], count=cnt, cfg=cfg)
    else:
        cnt, (orig_front,) = compact_words(matched, (view.perm,))
        gather_idx = jnp.where(
            jnp.arange(nr, dtype=jnp.int32) < cnt, orig_front[:nr], jnp.int32(n)
        )
        mj_out = both.take_fill(gather_idx)

    return {
        "nunique_r": nu_r,
        "nunique_s": nu_s,
        "merge_nres": mj_n,
        "hash_nres": hj_n,
        "agg_groups": nu_s,
        "aggs": aggs,
        "join_out": mj_out,
        "join_count": mj_n,
    }


pipeline_single = per_static_jit(pipeline_single_impl)


# ---------------------------------------------------------------------------
# staged execution: identical semantics, split into small XLA programs
# ---------------------------------------------------------------------------


def make_pipeline_staged(field: int = 1, cfg: EngineConfig = DEFAULT_CONFIG):
    """Build a staged runner: same results as ``pipeline_single`` but issued
    as several SMALL jitted programs instead of one monolith.

    Why: each distinct ``lax.sort`` shape costs 15-130 s at the remote
    compile service, and a single program holding all ~8 of the pipeline's
    sorts has been observed to hang/kill the service outright (round-1:
    1464 s; round-2: 1 h then EOF).  Each host dispatch through the tunnel
    also costs ~12 ms, so the split is exactly TWO programs per run:

      A: fused view sort + scans + the matched mask (and, for u32 keys,
         a 1-operand packed back-sort to original R order)
      B: the materializer — at narrow width ONE placement-sort group
         (3+K payload words; valid folded into the key), or for u32 key
         fields a direct sort of R by the packed (unmatched, key) with
         no dest permutation at all (movement.place_join_by_key, r4)
    """
    from ..batch import canonical_field
    from ..ops.movement import (
        place_batch,
        place_join_by_key,
        place_words_2d,
        use_sort_placement,
    )
    from ..ops.scan import seg_carry, seg_max, seg_min
    from ..ops.sort import survivor_dest

    fld = canonical_field(field)
    # u32 key fields materialize WITHOUT a dest permutation: matched packs
    # into the perm word (1-operand back sort instead of 2) and stage B
    # sorts R directly by the packed (unmatched, key) — r4, saves ~1 ms
    # of the 2M-row back-sort per run (movement.place_join_by_key)
    def _direct_place(r, s):
        return (
            fld in (0, 1)
            and cfg.packed_u32_sorts
            and cfg.materialize != "sort2d"
            and 4 + r.str_words <= 8
            # the packed back-sort/valid-fold kernels pack iota below the
            # flag bits: n < 2^30 (far above any budgeted input)
            and r.nrows + s.nrows < (1 << 30)
        )

    def stage_a(r: RecordBatch, s: RecordBatch) -> dict:
        from ..utils.checks import ensure_device_budget

        nr = r.nrows
        ensure_device_budget(nr + s.nrows, cfg, "pipeline_staged")
        both = RecordBatch.concat([r, s])
        view, adj, is_r, is_s, prev_side, _v_num = _pipeline_view(
            both, nr, field, cfg
        )
        r_first = is_r & ~adj
        s_first = is_s & ~(adj & (prev_side == 1))
        is_start = ~adj
        run_has_r = seg_carry(is_start, r_first.astype(jnp.uint32)) == 1
        end_flags = jnp.concatenate([is_start[1:], jnp.ones(1, bool)])
        any_s_suffix = jnp.flip(
            seg_max(jnp.flip(end_flags), jnp.flip(is_s.astype(jnp.uint32)))
        ) == 1
        matched = r_first & any_s_suffix
        out = {
            "nunique_r": jnp.sum(r_first, dtype=jnp.int32),
            "nunique_s": jnp.sum(s_first, dtype=jnp.int32),
            "merge_nres": jnp.sum(matched, dtype=jnp.int32),
            "hash_nres": jnp.sum((s_first & run_has_r).astype(jnp.int32)),
            "cnt": jnp.sum(matched, dtype=jnp.int32),
        }
        # each materialization path gets exactly the words it reads: the
        # gather path needs (perm, matched); the direct-place path a
        # 1-operand packed back-sort; the dest path survivor_dest (a full
        # 2-operand un-permute that must not run for the others)
        if not use_sort_placement(cfg):
            out["perm"] = view.perm
            out["matched"] = matched
        elif _direct_place(r, s):
            from ..ops.movement import packed_keep_backsort

            out["matched_r"] = packed_keep_backsort(view.perm, matched, nr)
        else:
            dest, _ = survivor_dest(view.perm, matched)
            out["dest"] = dest[:nr].astype(jnp.uint32)
        return out

    jit_a = jax.jit(stage_a)
    if cfg.materialize == "sort2d":
        jit_place = jax.jit(
            lambda dest, cnt, *words: place_words_2d(dest, cnt, list(words))
        )

        def place_all(dest, cnt, r):
            return RecordBatch.from_payload_words(
                list(jit_place(dest, cnt, *r.payload_words()))
            )
    else:
        # production: valid folded into the placement key (r4, 6->5 ops)
        def place_all(dest, cnt, r):
            return place_batch(dest, cnt, r)

    def _run_overbudget(r: RecordBatch, s: RecordBatch) -> dict:
        """Host-level composition from the unbounded ops (VERDICT r4 #3):
        distinct routes through the chunked two-pass driver, the
        intersection through the tiled join driver, materialization
        through gather chunks — every device program O(mem_rows).  Same
        result dict as the in-budget staged runner."""
        import numpy as np

        from ..ops.chunked import compact_rows_chunked
        from ..ops.distinct import distinct
        from ..ops.hash_join import hash_join_count

        # the valid predicate is the pipeline's selection filter (an
        # activity mask in the in-budget view sort) — the over-budget
        # composition must honor it the same way (r5 review: a valid=False
        # row once leaked into the over-budget counters)
        r_d, nu_r = distinct(r, field, cfg, active=r.valid)
        s_d, nu_s = distinct(s, field, cfg, active=s.valid)
        # matched R survivors in key order = semi-join of the dedup'd
        # sides (build side distinct => field-3 multiplicities are 1,
        # so nres is the intersection count for every field)
        m_r, _, mjn = hash_join_count(
            s_d, r_d, field, cfg, build_count=nu_s, probe_count=nu_r
        )
        mj_out, _ = compact_rows_chunked(r_d, np.asarray(m_r), cfg)
        return {
            "nunique_r": nu_r,
            "nunique_s": nu_s,
            "merge_nres": mjn,
            # over dedup'd sides both cross-check counters are the same
            # intersection cardinality; the in-budget pipeline likewise
            # derives both from ONE sort — no second full tiled join
            # (r5 review: it doubled over-budget wall time for zero
            # independent verification)
            "hash_nres": mjn,
            "agg_groups": nu_s,
            "join_out": mj_out,
            "join_count": mjn,
        }

    def materialize(out: dict, r: RecordBatch, s: RecordBatch) -> RecordBatch:
        """Stage B: the one record materialization from stage A's words."""
        nr = r.nrows
        if use_sort_placement(cfg):
            if "matched_r" in out:
                key_r = r.recid if fld == 0 else r.num
                return place_join_by_key(
                    out["matched_r"], key_r, out["cnt"], r,
                    key_plane="recid" if fld == 0 else "num",
                )
            return place_all(out["dest"], out["cnt"], r)
        cnt, (orig_front,) = compact_words(
            out["matched"], (out["perm"],)
        )
        gather_idx = jnp.where(
            jnp.arange(nr, dtype=jnp.int32) < cnt,
            orig_front[:nr],
            jnp.int32(nr + s.nrows),
        )
        return RecordBatch.concat([r, s]).take_fill(gather_idx)

    def run(r: RecordBatch, s: RecordBatch) -> dict:
        if r.nrows + s.nrows > cfg.mem_rows:
            return _run_overbudget(r, s)
        out = jit_a(r, s)
        mj_out = materialize(out, r, s)
        return {
            "nunique_r": out["nunique_r"],
            "nunique_s": out["nunique_s"],
            "merge_nres": out["merge_nres"],
            "hash_nres": out["hash_nres"],
            "agg_groups": out["nunique_s"],
            "join_out": mj_out,
            "join_count": out["merge_nres"],
        }

    # expose the stage programs for per-stage accounting (bench.py /
    # tools/floor_accounting.py — VERDICT r4 #1); production callers use
    # run() only
    run.stage_a = jit_a  # type: ignore[attr-defined]
    run.materialize = materialize  # type: ignore[attr-defined]
    return run


def _dist_caps(nrow_r: int, nrow_s: int, ndev: int, cfg: EngineConfig):
    cap_r = max(int(nrow_r * cfg.shuffle_slack) // ndev + 1, 64)
    cap_s = max(int(nrow_s * cfg.shuffle_slack) // ndev + 1, 64)
    return cap_r, cap_s


def _dist_stage_local(rb, rc, sb, sc, field, cfg):
    """Stage 1 (per-chip, no collectives): filter + local dedup + partial
    aggregates.  The local-first half of the plan — everything before any
    row crosses the interconnect."""
    nrow_r = rb.nrows
    nrow_s = sb.nrows
    rf, rcf = compact(rb, rb.valid & (jnp.arange(nrow_r) < rc), cfg)
    sf, scf = compact(sb, sb.valid & (jnp.arange(nrow_s) < sc), cfg)
    rloc, nur_loc = distinct_impl(rf, field, cfg, count=rcf)
    sloc, s_pagg, nus_loc = group_aggregate_impl(
        sf, field, cfg, count=scf, materialize_reps=True
    )
    return rloc, nur_loc, sloc, s_pagg, nus_loc


def _dist_stage_shuffle(
    rloc, nur_loc, sloc, s_pagg, nus_loc, field, cfg, ndev, ax, cap_r, cap_s
):
    """Stage 2 (the exchange): one hash-partition all-to-all per table;
    S's partial aggregates ride as extra words."""
    from ..parallel.shuffle import shuffle_with_extra

    rdest = key_hash(rloc, field) % jnp.uint32(ndev)
    sdest = key_hash(sloc, field) % jnp.uint32(ndev)
    rsh, _, rtot, ovf1 = shuffle_with_extra(
        rloc, nur_loc, rdest, ax, ndev, cap_r, cfg,
        nchunks=cfg.shuffle_nchunks,
    )
    ssh, s_px, stot, ovf2 = shuffle_with_extra(
        sloc, nus_loc, sdest, ax, ndev, cap_s, cfg,
        extra=(
            s_pagg["count"].astype(jnp.uint32),
            s_pagg["sum"],
            s_pagg["min"],
            s_pagg["max"],
        ),
        nchunks=cfg.shuffle_nchunks,
    )
    return rsh, rtot, ssh, s_px, stot, ovf1 + ovf2


def _dist_stage_join(
    rsh, rtot, ssh, s_px, stot, field, cfg, ndev, ax, cap_r, cap_s
):
    """Stage 3 (colocated): global combine + joins + psum'd counters."""
    from ..ops.aggregate import combine_group_aggregate_impl
    from ..parallel.overlap import overlap_key_words

    engine = cfg.dist_join_engine
    rd, nur = distinct_impl(rsh, field, cfg, count=rtot)
    sd, aggs, nus = combine_group_aggregate_impl(
        ssh, field, s_px, cfg, count=stot, materialize_reps=True
    )
    mj_out, mjn = join_sorted_distinct_impl(rd, nur, sd, nus, field, cfg)

    # HashJoin cross-check on the dedup'd intermediates (main.cpp:121)
    # via the configured engine — every engine returns the same count.
    # The intermediates are ALREADY hash-colocated, so the engines run
    # with colocated=True: their internal exchanges (which would route
    # every row to its own chip, forcing ndev*(nrow+slack) slot buffers
    # per chip and tripping the device-memory gate at larger meshes)
    # are elided while the detection/probing machinery still runs.
    if engine == "skew":
        from ..parallel.skew import skew_join_local

        cap_hot = min(max(2 * ndev * cfg.hh_topk, 64), rd.nrows)
        _, _, hjn_g, hj_ovf, _ = skew_join_local(
            rd, nur, sd, nus, field, cfg, ndev, ax,
            cap_r, cap_s, cap_hot, colocated=True,
        )
    elif engine == "overlap" and (
        overlap_key_words(rd, field) is not None
        and overlap_key_words(sd, field) is not None
        # both non-None implies equal word counts (non-None for string
        # fields requires str_words == 2 on that side)
    ):
        from ..parallel.overlap import overlapped_join_local

        oj_chunks = max(cfg.shuffle_nchunks, 2)
        _, _, hjn_g, hj_ovf = overlapped_join_local(
            rd, nur, sd, nus, field, cfg, ndev, ax,
            cap_r, cap_s, -(-cap_s // oj_chunks), oj_chunks,
            colocated=True,
        )
    else:
        _, _, hjn = hash_join_count_impl(
            rd, sd, field, cfg, build_count=nur, probe_count=nus
        )
        hjn_g = jax.lax.psum(hjn, ax)
        hj_ovf = jnp.int32(0)

    return {
        "nunique_r": jax.lax.psum(nur, ax),
        "nunique_s": jax.lax.psum(nus, ax),
        "merge_nres": jax.lax.psum(mjn, ax),
        "hash_nres": hjn_g,
        "agg_groups": jax.lax.psum(nus, ax),
        "join_out": mj_out,
        "join_counts": mjn[None].astype(jnp.int32),
        "agg_count": aggs["count"],
        "agg_sum": aggs["sum"],
        "overflow": hj_ovf,
    }


def make_dist_pipeline(mesh: Mesh, field: int = 1, cfg: EngineConfig = DEFAULT_CONFIG):
    """Build the jitted multi-chip pipeline step for `mesh`.

    Returned fn signature: (r_batch, r_counts, s_batch, s_counts) with rows
    sharded over the mesh; returns the same counter dict as pipeline_single
    (counters globally psum'd and replicated) plus shuffle overflow.

    Plan shape (r3): **local-first**.  Every operator in the reference
    driver's plan is distinct-based (MergeJoin dedups both inputs,
    main.cpp:109-123; the cross-check HashJoin runs on the dedup'd
    intermediates), so each chip first dedups its own rows (plus computes
    per-key partial aggregates for the S side) and only the survivors
    cross the interconnect.  This makes the composed program skew-proof by
    construction — any key contributes at most ONE row per chip per side
    to the exchange, so a Zipf-hot key moves <= ndev rows instead of its
    full multiplicity (BASELINE config 4) — and cuts exchange bytes to the
    distinct-key volume.  The S side's partial (count,sum,min,max) ride
    the shuffle as extra u32 words and are merged by a segmented combine
    (two-phase aggregation).  ``cfg.shuffle_nchunks`` > 1 splits the
    exchanges into independent slices XLA can overlap with unpack compute
    (BASELINE config 5); ``cfg.dist_join_engine`` selects the HashJoin
    cross-check engine (sorted kernel / skew machinery / overlapped
    key-only machinery — all exact; see config.py).
    """
    ndev = mesh_size(mesh)
    ax = mesh.axis_names if len(mesh.axis_names) > 1 else mesh.axis_names[0]
    row = P(mesh.axis_names)

    def step(rb, rc, sb, sc):
        rc, sc = rc[0], sc[0]
        cap_r, cap_s = _dist_caps(rb.nrows, sb.nrows, ndev, cfg)
        rloc, nur_loc, sloc, s_pagg, nus_loc = _dist_stage_local(
            rb, rc, sb, sc, field, cfg
        )
        rsh, rtot, ssh, s_px, stot, sh_ovf = _dist_stage_shuffle(
            rloc, nur_loc, sloc, s_pagg, nus_loc,
            field, cfg, ndev, ax, cap_r, cap_s,
        )
        out = _dist_stage_join(
            rsh, rtot, ssh, s_px, stot, field, cfg, ndev, ax, cap_r, cap_s
        )
        out["overflow"] = out["overflow"] + sh_ovf
        return out

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
            "agg_count": row,
            "agg_sum": row,
            "overflow": P(),
        },
        check_vma=False,
    )
    return resilient_jit(lambda: jax.jit(sharded))


def make_dist_pipeline_staged(
    mesh: Mesh,
    field: int = 1,
    cfg: EngineConfig = DEFAULT_CONFIG,
    ckpt_dir: str | None = None,
    fail_after: str | None = None,
):
    """The distributed plan as THREE jitted stage programs with per-stage
    sharded checkpoints (SURVEY §5 checkpoint row; VERDICT r3 missing #3).

    Identical semantics to :func:`make_dist_pipeline` (same stage bodies,
    ``_dist_stage_*``), but each stage's output partitions materialize to
    ``ckpt_dir`` (per-process npz shards + manifest) and a re-run SKIPS
    completed stages — recovery after a host death re-executes only the
    stage that failed, not the whole step.  ``fail_after`` is the fault-
    injection hook: the process dies (exit 17) immediately after the named
    stage ("local" | "shuffle") checkpoints, so tests can deterministically
    create a half-complete run.

    Returned ``run(rb, rc, sb, sc)`` yields the fused step's counter dict
    plus ``resumed_stages`` (which stages were loaded from the manifest).
    """
    from ..parallel.checkpoint import InjectedStageFailure, StageCheckpoints

    ndev = mesh_size(mesh)
    ax = mesh.axis_names if len(mesh.axis_names) > 1 else mesh.axis_names[0]
    row = P(mesh.axis_names)
    pagg_spec = {"count": row, "sum": row, "min": row, "max": row}
    # the three stage programs are built once per input shape signature —
    # rebuilding fresh jit objects per run() call would retrace and
    # recompile every stage on every step (r4 review finding)
    _prog_cache: dict = {}

    def run(rb: RecordBatch, rc, sb: RecordBatch, sc) -> dict:
        per_r = rb.nrows // ndev
        per_s = sb.nrows // ndev
        cap_r, cap_s = _dist_caps(per_r, per_s, ndev, cfg)
        resumed: list[str] = []
        # fingerprint ties checkpoints to THIS run's inputs/config: a
        # reused --stage-checkpoints dir with different data, field, or
        # engine must recompute, not resume stale shards
        if ckpt_dir:
            from ..parallel.checkpoint import local_content_tag

            ckpt = StageCheckpoints(
                ckpt_dir,
                fingerprint={
                    "field": int(field) if not isinstance(field, str) else field,
                    "ndev": ndev,
                    "shapes": [rb.nrows, sb.nrows, rb.str_words, sb.str_words],
                    "cfg": [cfg.shuffle_slack, cfg.shuffle_nchunks,
                            cfg.dist_join_engine, cfg.packed_u32_sorts],
                },
                # per-process content hash: same-shaped DIFFERENT data in a
                # reused dir must recompute, never resume
                local_tag=local_content_tag(
                    [rb.recid, rb.num, rb.strw, rb.valid, rc,
                     sb.recid, sb.num, sb.strw, sb.valid, sc]
                ),
            )
        else:
            ckpt = None

        shape_key = (rb.nrows, sb.nrows, rb.str_words, sb.str_words)
        progs = _prog_cache.setdefault(shape_key, {})

        def _prog(name, build):
            if name not in progs:
                progs[name] = resilient_jit(build)
            return progs[name]

        # ---- stage 1: local (filter + dedup + partial aggregates) -------
        def a_body(rb_, rc_, sb_, sc_):
            rloc, nur, sloc, pagg, nus = _dist_stage_local(
                rb_, rc_[0], sb_, sc_[0], field, cfg
            )
            return (
                rloc, nur[None].astype(jnp.int32),
                sloc, pagg, nus[None].astype(jnp.int32),
            )

        if ckpt is not None and ckpt.stage_done("local"):
            a = ckpt.load_stage("local", mesh)
            rloc = RecordBatch(
                recid=a["r_recid"], num=a["r_num"],
                strw=a["r_strw"], valid=a["r_valid"],
            )
            sloc = RecordBatch(
                recid=a["s_recid"], num=a["s_num"],
                strw=a["s_strw"], valid=a["s_valid"],
            )
            nur, nus = a["r_cnt"], a["s_cnt"]
            pagg = {k: a[f"pg_{k}"] for k in ("count", "sum", "min", "max")}
            resumed.append("local")
        else:
            rloc, nur, sloc, pagg, nus = _prog(
                "local",
                lambda: jax.jit(shard_map(
                    a_body, mesh=mesh, in_specs=(row, row, row, row),
                    out_specs=(row, row, row, pagg_spec, row),
                    check_vma=False,
                )),
            )(rb, rc, sb, sc)
            if ckpt is not None:
                ckpt.save_stage("local", {
                    "r_recid": rloc.recid, "r_num": rloc.num,
                    "r_strw": rloc.strw, "r_valid": rloc.valid,
                    "r_cnt": nur,
                    "s_recid": sloc.recid, "s_num": sloc.num,
                    "s_strw": sloc.strw, "s_valid": sloc.valid,
                    "s_cnt": nus,
                    **{f"pg_{k}": v for k, v in pagg.items()},
                })
                if fail_after == "local":
                    raise InjectedStageFailure("local")

        # ---- stage 2: the exchange --------------------------------------
        def b_body(rl, nur_, sl, pg, nus_):
            rsh, rtot, ssh, s_px, stot, ovf = _dist_stage_shuffle(
                rl, nur_[0], sl, pg, nus_[0],
                field, cfg, ndev, ax, cap_r, cap_s,
            )
            return (
                rsh, rtot[None].astype(jnp.int32),
                ssh, tuple(s_px), stot[None].astype(jnp.int32), ovf,
            )

        if ckpt is not None and ckpt.stage_done("shuffle"):
            b = ckpt.load_stage("shuffle", mesh)
            rsh = RecordBatch(
                recid=b["r_recid"], num=b["r_num"],
                strw=b["r_strw"], valid=b["r_valid"],
            )
            ssh = RecordBatch(
                recid=b["s_recid"], num=b["s_num"],
                strw=b["s_strw"], valid=b["s_valid"],
            )
            rtot, stot = b["r_cnt"], b["s_cnt"]
            s_px = tuple(b[f"px_{j}"] for j in range(4))
            sh_ovf = int(ckpt.load_scalars("shuffle")["overflow"])
            resumed.append("shuffle")
        else:
            npx = 4
            rsh, rtot, ssh, s_px, stot, ovf = _prog(
                "shuffle",
                lambda: jax.jit(shard_map(
                    b_body, mesh=mesh,
                    in_specs=(row, row, row, pagg_spec, row),
                    out_specs=(row, row, row, (row,) * npx, row, P()),
                    check_vma=False,
                )),
            )(rloc, nur, sloc, pagg, nus)
            sh_ovf = int(ovf)
            if ckpt is not None:
                ckpt.save_stage("shuffle", {
                    "r_recid": rsh.recid, "r_num": rsh.num,
                    "r_strw": rsh.strw, "r_valid": rsh.valid,
                    "r_cnt": rtot,
                    "s_recid": ssh.recid, "s_num": ssh.num,
                    "s_strw": ssh.strw, "s_valid": ssh.valid,
                    "s_cnt": stot,
                    **{f"px_{j}": w for j, w in enumerate(s_px)},
                }, scalars={"overflow": sh_ovf})
                if fail_after == "shuffle":
                    raise InjectedStageFailure("shuffle")

        # ---- stage 3: global combine + joins ----------------------------
        def c_body(rsh_, rtot_, ssh_, px, stot_):
            return _dist_stage_join(
                rsh_, rtot_[0], ssh_, tuple(px), stot_[0],
                field, cfg, ndev, ax, cap_r, cap_s,
            )

        out = _prog(
            "join",
            lambda: jax.jit(shard_map(
                c_body, mesh=mesh,
                in_specs=(row, row, row, (row,) * 4, row),
                out_specs={
                    "nunique_r": P(),
                    "nunique_s": P(),
                    "merge_nres": P(),
                    "hash_nres": P(),
                    "agg_groups": P(),
                    "join_out": row,
                    "join_counts": row,
                    "agg_count": row,
                    "agg_sum": row,
                    "overflow": P(),
                },
                check_vma=False,
            ))
        )(rsh, rtot, ssh, s_px, stot)
        out = dict(out)
        out["overflow"] = int(out["overflow"]) + sh_ovf
        out["resumed_stages"] = resumed
        if ckpt is not None:
            # run complete: the checkpoints' purpose (resume a FAILED run)
            # is spent — drop the shards so a reused dir can never serve
            # stale intermediates and disk is reclaimed (the external
            # sort's store.cleanup() convention)
            ckpt.cleanup()
        return out

    return run
