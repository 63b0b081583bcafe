"""Pipeline tests: single-chip and distributed plans agree with the model
and with each other (the reference driver's own cross-check, main.cpp:109-123)."""

import numpy as np
import pytest

import model as M

from database_technology_algorithms_tpu.config import EngineConfig
from database_technology_algorithms_tpu.models.pipeline import (
    make_dist_pipeline,
    pipeline_single,
)
from database_technology_algorithms_tpu.parallel import distribute, make_mesh

CFG = EngineConfig(shuffle_slack=4.0)


@pytest.mark.parametrize("field", [0, 1, 2, 3])
def test_pipeline_single_counters(rng, field):
    c1 = M.random_cols(rng, 600, key_range=80)
    c2 = M.random_cols(rng, 500, key_range=80)
    out = pipeline_single(M.to_batch(c1), M.to_batch(c2), field, CFG)
    _, nu_r = M.model_distinct(c1, field)
    _, nu_s = M.model_distinct(c2, field)
    _, mj = M.model_merge_join(c1, c2, field)
    assert int(out["nunique_r"]) == nu_r
    assert int(out["nunique_s"]) == nu_s
    assert int(out["merge_nres"]) == mj
    # driver cross-check: hash join on dedup'd inputs == merge join
    assert int(out["hash_nres"]) == mj
    agg, keys = M.model_group_aggregate(c2, field)
    assert int(out["agg_groups"]) == len(keys)


@pytest.mark.parametrize("field", [0, 1, 2, 3])
def test_pipeline_single_join_output_rows(rng, field):
    """join_out must hold exactly the model's matched R survivors, in key
    order, zero-padded past join_count (all four key domains)."""
    c1 = M.random_cols(rng, 400, key_range=70)
    c2 = M.random_cols(rng, 350, key_range=70)
    out = pipeline_single(M.to_batch(c1), M.to_batch(c2), field, CFG)
    matched_idx, mj = M.model_merge_join(c1, c2, field)
    cnt = int(out["join_count"])
    assert cnt == mj
    got = out["join_out"].to_numpy()
    # model indices are in sorted-key order already (model_distinct order)
    np.testing.assert_array_equal(got["recid"][:cnt], c1["recid"][matched_idx])
    np.testing.assert_array_equal(got["num"][:cnt], c1["num"][matched_idx])
    np.testing.assert_array_equal(got["strs"][:cnt], c1["strs"][matched_idx])
    assert np.all(got["recid"][cnt:] == 0)


@pytest.mark.parametrize("field", [1, 3])
def test_pipeline_single_aggregates(rng, field):
    """Per-group aggregates from the fused view match the model (count, sum,
    min, max over num per distinct S key, sorted key order)."""
    c1 = M.random_cols(rng, 200, key_range=30)
    c2 = M.random_cols(rng, 300, key_range=30)
    out = pipeline_single(M.to_batch(c1), M.to_batch(c2), field, CFG)
    agg, keys_sorted = M.model_group_aggregate(c2, field)
    ng = int(out["agg_groups"])
    assert ng == len(keys_sorted)
    a = {k: np.asarray(v) for k, v in out["aggs"].items()}
    for g, k in enumerate(keys_sorted):
        ec, es, emn, emx = agg[k]
        assert int(a["count"][g]) == ec, (g, k)
        assert int(a["sum"][g]) == es % (1 << 32)
        assert int(a["min"][g]) == emn
        assert int(a["max"][g]) == emx


def test_pipeline_single_invalid_rows_filtered(rng):
    c1 = M.random_cols(rng, 300, key_range=40)
    c2 = M.random_cols(rng, 300, key_range=40)
    c1["valid"][::2] = False
    f1 = {k: v[c1["valid"]] if k != "valid" else v[c1["valid"]] for k, v in c1.items()}
    out = pipeline_single(M.to_batch(c1), M.to_batch(c2), 1, CFG)
    _, mj = M.model_merge_join(f1, c2, 1)
    assert int(out["merge_nres"]) == mj


@pytest.mark.parametrize("field", [1, 2])
def test_pipeline_distributed_matches_single(rng, field):
    mesh = make_mesh()
    c1 = M.random_cols(rng, 800, key_range=60)
    c2 = M.random_cols(rng, 700, key_range=60)
    t1, t2 = distribute(mesh, c1), distribute(mesh, c2)
    step = make_dist_pipeline(mesh, field, CFG)
    out = step(t1.batch, t1.count, t2.batch, t2.count)
    assert int(out["overflow"]) == 0

    single = pipeline_single(M.to_batch(c1), M.to_batch(c2), field, CFG)
    for k in ("nunique_r", "nunique_s", "merge_nres", "hash_nres", "agg_groups"):
        assert int(out[k]) == int(single[k]), k


@pytest.mark.parametrize("mat", ["sort", "gather"])
def test_pipeline_staged_matches_monolith(rng, mat):
    """make_pipeline_staged (small separately-jitted programs, shared
    placement executable) must be bit-identical to pipeline_single."""
    from database_technology_algorithms_tpu.models.pipeline import (
        make_pipeline_staged,
    )

    cfg = EngineConfig(materialize=mat)
    r = M.to_batch(M.random_cols(rng, 410, key_range=70))
    s = M.to_batch(M.random_cols(rng, 330, key_range=70))
    a = pipeline_single(r, s, 1, cfg)
    b = make_pipeline_staged(1, cfg)(r, s)
    for k in ("nunique_r", "nunique_s", "merge_nres", "hash_nres",
              "agg_groups", "join_count"):
        assert int(a[k]) == int(b[k]), k
    an, bn = a["join_out"].to_numpy(), b["join_out"].to_numpy()
    for k in ("recid", "num", "strs", "valid"):
        np.testing.assert_array_equal(an[k], bn[k])


def test_pipeline_distributed_field3(rng):
    mesh = make_mesh()
    c1 = M.random_cols(rng, 500, key_range=40)
    c2 = M.random_cols(rng, 400, key_range=40)
    t1, t2 = distribute(mesh, c1), distribute(mesh, c2)
    step = make_dist_pipeline(mesh, 3, CFG)
    out = step(t1.batch, t1.count, t2.batch, t2.count)
    assert int(out["overflow"]) == 0
    single = pipeline_single(M.to_batch(c1), M.to_batch(c2), 3, CFG)
    for k in ("nunique_r", "nunique_s", "merge_nres", "agg_groups"):
        assert int(out[k]) == int(single[k]), k


def _zipf_cols(n, key_range, seed, s=1.3):
    """Host Zipf columns (BASELINE config 4 key distribution)."""
    g = np.random.default_rng(seed)
    u = g.uniform(1e-6, 1.0, n)
    ranks = np.floor(u ** (-1.0 / (s - 1.0))) - 1.0
    num = np.clip(ranks, 0, key_range - 1).astype(np.uint32)
    strs = np.zeros((n, 8), np.uint8)
    strs[:, :5] = g.integers(97, 123, size=(n, 5), dtype=np.uint8)
    return {
        "recid": np.arange(n, dtype=np.uint32),
        "num": num,
        "strs": strs,
        "valid": np.ones(n, bool),
    }


def test_pipeline_distributed_zipf(rng):
    """BASELINE config 4 as ONE composed program: Zipf-keyed tables through
    the distributed plan must equal the single-chip pipeline with zero
    overflow — the local-first plan bounds any hot key to <= 1 row per chip
    per side before the exchange, so Zipf skew cannot melt a destination."""
    mesh = make_mesh()
    c1 = _zipf_cols(2000, 300, seed=21)
    c2 = _zipf_cols(2000, 300, seed=22)
    t1, t2 = distribute(mesh, c1), distribute(mesh, c2)
    # tight slack: the raw-shuffle round-2 plan overflowed here; local-first
    # must not (hot key 0 holds ~45% of all rows)
    cfg = EngineConfig(shuffle_slack=2.0)
    step = make_dist_pipeline(mesh, 1, cfg)
    out = step(t1.batch, t1.count, t2.batch, t2.count)
    assert int(out["overflow"]) == 0
    single = pipeline_single(M.to_batch(c1), M.to_batch(c2), 1, cfg)
    for k in ("nunique_r", "nunique_s", "merge_nres", "hash_nres", "agg_groups"):
        assert int(out[k]) == int(single[k]), k


@pytest.mark.parametrize("engine", ["skew", "overlap"])
def test_pipeline_distributed_join_engines(rng, engine):
    """The composed plan with the skew / overlapped cross-check engines
    (config-driven switch) returns identical counters (BASELINE configs
    4-5 as single composed programs)."""
    mesh = make_mesh()
    c1 = _zipf_cols(1500, 200, seed=31)
    c2 = _zipf_cols(1500, 200, seed=32)
    t1, t2 = distribute(mesh, c1), distribute(mesh, c2)
    cfg = EngineConfig(
        shuffle_slack=3.0,
        dist_join_engine=engine,
        shuffle_nchunks=4 if engine == "overlap" else 1,
    )
    step = make_dist_pipeline(mesh, 1, cfg)
    out = step(t1.batch, t1.count, t2.batch, t2.count)
    assert int(out["overflow"]) == 0
    single = pipeline_single(M.to_batch(c1), M.to_batch(c2), 1, cfg)
    for k in ("nunique_r", "nunique_s", "merge_nres", "hash_nres", "agg_groups"):
        assert int(out[k]) == int(single[k]), (engine, k)


@pytest.mark.parametrize("engine", ["skew", "overlap"])
def test_pipeline_engines_string_field(rng, engine):
    """Cross-check engines on a narrow string field ('3'): the overlap
    engine exchanges 3 u32 word planes, the skew engine hashes full keys;
    both must equal the single-chip counters."""
    mesh = make_mesh()
    c1 = _zipf_cols(1200, 60, seed=41)
    c2 = _zipf_cols(1200, 60, seed=42)
    t1, t2 = distribute(mesh, c1), distribute(mesh, c2)
    cfg = EngineConfig(shuffle_slack=3.0, dist_join_engine=engine)
    step = make_dist_pipeline(mesh, 3, cfg)
    out = step(t1.batch, t1.count, t2.batch, t2.count)
    assert int(out["overflow"]) == 0
    single = pipeline_single(M.to_batch(c1), M.to_batch(c2), 3, cfg)
    for k in ("nunique_r", "nunique_s", "merge_nres", "hash_nres"):
        assert int(out[k]) == int(single[k]), (engine, k)


def test_pipeline_overlap_asymmetric_width_falls_back(rng):
    """ADVICE r3 #1: engine="overlap" with R storing 2 string words but S
    storing a wider bucket must fall back to the sorted engine (not
    TypeError at trace time) and stay exact."""
    mesh = make_mesh()
    c1 = _zipf_cols(800, 50, seed=51)  # 5-char strings -> 2-word bucket
    g = np.random.default_rng(52)
    n = 800
    strs = np.zeros((n, 16), np.uint8)
    strs[:, :12] = g.integers(97, 123, size=(n, 12), dtype=np.uint8)
    c2 = {
        "recid": np.arange(n, dtype=np.uint32),
        "num": g.integers(0, 50, n, dtype=np.uint32).astype(np.uint32),
        "strs": strs,  # 12-char strings -> 4-word bucket
        "valid": np.ones(n, bool),
    }
    t1, t2 = distribute(mesh, c1), distribute(mesh, c2)
    cfg = EngineConfig(shuffle_slack=3.0, dist_join_engine="overlap")
    step = make_dist_pipeline(mesh, 2, cfg)
    out = step(t1.batch, t1.count, t2.batch, t2.count)
    assert int(out["overflow"]) == 0
    single = pipeline_single(M.to_batch(c1), M.to_batch(c2), 2, cfg)
    for k in ("nunique_r", "nunique_s", "merge_nres", "hash_nres"):
        assert int(out[k]) == int(single[k]), k


def test_pipeline_distributed_aggregate_values(rng):
    """Two-phase aggregation: merged partial (count,sum) across chips must
    equal the single-chip per-group aggregates as multisets."""
    mesh = make_mesh()
    c2 = M.random_cols(rng, 900, key_range=50)
    c1 = M.random_cols(rng, 300, key_range=50)
    t1, t2 = distribute(mesh, c1), distribute(mesh, c2)
    step = make_dist_pipeline(mesh, 1, CFG)
    out = step(t1.batch, t1.count, t2.batch, t2.count)
    assert int(out["overflow"]) == 0
    single = pipeline_single(M.to_batch(c1), M.to_batch(c2), 1, CFG)
    ns = int(single["agg_groups"])
    want = sorted(
        zip(
            np.asarray(single["aggs"]["count"])[:ns].tolist(),
            np.asarray(single["aggs"]["sum"])[:ns].tolist(),
        )
    )
    got_c = np.asarray(out["agg_count"])
    got_s = np.asarray(out["agg_sum"])
    live = got_c > 0
    got = sorted(zip(got_c[live].tolist(), got_s[live].tolist()))
    assert got == want


def test_pipeline_staged_checkpoint_resume(rng, tmp_path):
    """Per-stage checkpointing (SURVEY §5): the staged dist runner equals
    the fused step; after an injected death the re-run provably SKIPS the
    completed stages (resumed from sharded manifest) and stays exact."""
    import pytest as _pytest

    from database_technology_algorithms_tpu.models.pipeline import (
        make_dist_pipeline_staged,
    )
    from database_technology_algorithms_tpu.parallel.checkpoint import (
        InjectedStageFailure,
    )

    mesh = make_mesh()
    c1 = M.random_cols(rng, 900, key_range=80)
    c2 = M.random_cols(rng, 1000, key_range=80)
    t1, t2 = distribute(mesh, c1), distribute(mesh, c2)
    ck = str(tmp_path / "stages")

    # first attempt dies right after the shuffle stage checkpoints
    run_fail = make_dist_pipeline_staged(
        mesh, 1, CFG, ckpt_dir=ck, fail_after="shuffle"
    )
    with _pytest.raises(InjectedStageFailure):
        run_fail(t1.batch, t1.count, t2.batch, t2.count)

    # resume: both completed stages load from the manifest
    run = make_dist_pipeline_staged(mesh, 1, CFG, ckpt_dir=ck)
    out = run(t1.batch, t1.count, t2.batch, t2.count)
    assert out["resumed_stages"] == ["local", "shuffle"]
    assert int(out["overflow"]) == 0
    single = pipeline_single(M.to_batch(c1), M.to_batch(c2), 1, CFG)
    for k in ("nunique_r", "nunique_s", "merge_nres", "hash_nres", "agg_groups"):
        assert int(out[k]) == int(single[k]), k

    # and a fresh (no-checkpoint-dir) staged run matches too
    fresh = make_dist_pipeline_staged(mesh, 1, CFG)
    out2 = fresh(t1.batch, t1.count, t2.batch, t2.count)
    assert out2["resumed_stages"] == []
    for k in ("nunique_r", "nunique_s", "merge_nres", "hash_nres"):
        assert int(out2[k]) == int(single[k]), k


def test_pipeline_staged_checkpoint_fingerprint(rng, tmp_path):
    """A reused checkpoint dir must never resume another run's
    intermediates: different inputs (or config) under the same dir
    recompute from scratch (r4 review finding), and a COMPLETED run
    cleans its shards up."""
    import os

    from database_technology_algorithms_tpu.models.pipeline import (
        make_dist_pipeline_staged,
    )
    from database_technology_algorithms_tpu.parallel.checkpoint import (
        InjectedStageFailure,
    )

    mesh = make_mesh()
    ck = str(tmp_path / "fp")
    c1 = M.random_cols(rng, 600, key_range=50)
    c2 = M.random_cols(rng, 600, key_range=50)
    t1, t2 = distribute(mesh, c1), distribute(mesh, c2)

    # die after stage 1 with run A's data
    import pytest as _pytest

    run_fail = make_dist_pipeline_staged(
        mesh, 1, CFG, ckpt_dir=ck, fail_after="local"
    )
    with _pytest.raises(InjectedStageFailure):
        run_fail(t1.batch, t1.count, t2.batch, t2.count)

    # run B: DIFFERENT data, same dir — must NOT resume run A's stage
    d1 = M.random_cols(rng, 600, key_range=50)
    d2 = M.random_cols(rng, 600, key_range=50)
    u1, u2 = distribute(mesh, d1), distribute(mesh, d2)
    run_b = make_dist_pipeline_staged(mesh, 1, CFG, ckpt_dir=ck)
    out_b = run_b(u1.batch, u1.count, u2.batch, u2.count)
    assert out_b["resumed_stages"] == []
    single_b = pipeline_single(M.to_batch(d1), M.to_batch(d2), 1, CFG)
    for k in ("nunique_r", "nunique_s", "merge_nres", "hash_nres"):
        assert int(out_b[k]) == int(single_b[k]), k
    # completed run cleaned its shards
    assert [f for f in os.listdir(ck) if f.endswith(".npz")] == []
