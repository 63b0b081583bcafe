"""Distributed operators on a virtual 8-device CPU mesh.

Contract (SURVEY.md §2.3): whole-table results of every distributed operator
must equal the single-chip/model results — same pjit/shard_map code path a
real pod uses (§4c).
"""

import numpy as np
import pytest

import model as M

from database_technology_algorithms_tpu.config import EngineConfig
from database_technology_algorithms_tpu.parallel import (
    collect,
    dist_aggregate,
    dist_distinct,
    dist_hash_join,
    dist_sort,
    distribute,
    make_mesh,
)

FIELDS = [0, 1, 2, 3]
CFG = EngineConfig(shuffle_slack=4.0)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh()


def _sorted_key_tuples(cols, field):
    keys = M.all_keys(cols, field)
    return sorted(keys)


@pytest.mark.parametrize("field", FIELDS)
def test_dist_distinct(rng, mesh, field):
    cols = M.random_cols(rng, 1000, key_range=60)
    t = distribute(mesh, cols)
    out, nunique, ovf = dist_distinct(mesh, t, field, CFG)
    assert int(ovf) == 0
    _, n_expect = M.model_distinct(cols, field)
    assert int(nunique) == n_expect
    got = collect(out)
    # distinct keys across chips == model's distinct key set
    got_keys = sorted(M.all_keys(got, field))
    idx, _ = M.model_distinct(cols, field)
    expect_keys = sorted(M.key_of(cols, i, field) for i in idx)
    assert got_keys == expect_keys


@pytest.mark.parametrize("field", FIELDS)
def test_dist_sort(rng, mesh, field):
    cols = M.random_cols(rng, 1100, key_range=60)
    t = distribute(mesh, cols)
    out, ovf = dist_sort(mesh, t, field, CFG)
    assert int(ovf) == 0
    got = collect(out)
    assert len(got["recid"]) == 1100
    # chips concatenated in order == globally sorted key sequence
    got_keys = M.all_keys(got, field)
    assert got_keys == _sorted_key_tuples(cols, field)
    # multiset of full rows preserved
    perm = M.model_sort_perm(cols, field)
    exp = [(int(cols["recid"][i]), int(cols["num"][i]), M.cstr(cols["strs"][i])) for i in perm]
    got_rows = sorted(
        (int(got["recid"][i]), int(got["num"][i]), M.cstr(got["strs"][i]))
        for i in range(1100)
    )
    assert got_rows == sorted(exp)


@pytest.mark.parametrize("field", FIELDS)
def test_dist_hash_join(rng, mesh, field):
    build = M.random_cols(rng, 900, key_range=50)
    probe = M.random_cols(rng, 1000, key_range=50)
    tb = distribute(mesh, build)
    tp = distribute(mesh, probe)
    out, nres, ovf = dist_hash_join(mesh, tb, tp, field, CFG)
    assert int(ovf) == 0
    _, _, m_nres = M.model_hash_join(build, probe, field)
    assert int(nres) == m_nres
    if field != 3:
        got = collect(out)
        m_matched, _, _ = M.model_hash_join(build, probe, field)
        keep = [i for i, m in enumerate(m_matched) if m]
        # emitted rows = matched probe rows (as a multiset across chips)
        exp = sorted(
            (int(probe["recid"][i]), int(probe["num"][i]), M.cstr(probe["strs"][i]))
            for i in keep
        )
        gotr = sorted(
            (int(got["recid"][i]), int(got["num"][i]), M.cstr(got["strs"][i]))
            for i in range(len(got["recid"]))
        )
        assert gotr == exp


@pytest.mark.parametrize("field", [1, 2])
def test_dist_aggregate(rng, mesh, field):
    cols = M.random_cols(rng, 800, key_range=23)
    t = distribute(mesh, cols)
    out, aggs, ovf = dist_aggregate(mesh, t, field, CFG)
    assert int(ovf) == 0
    agg_expect, keys_sorted = M.model_group_aggregate(cols, field)
    got = collect(out)
    counts = np.asarray(aggs["count"])
    mins = np.asarray(aggs["min"])
    per = out.rows_per_chip
    chip_counts = np.asarray(out.count)
    assert int(chip_counts.sum()) == len(keys_sorted)
    # per-group aggregates match the model, keyed by the rep rows
    # (collected rows are in chip order; agg arrays are per-chip padded)
    keys_got = M.all_keys(got, field)
    flat_counts = []
    flat_mins = []
    off = 0
    for d in range(len(chip_counts)):
        c = chip_counts[d]
        flat_counts.extend(counts[d * per : d * per + c])
        flat_mins.extend(mins[d * per : d * per + c])
    for k, c, mn in zip(keys_got, flat_counts, flat_mins):
        ec, es, emn, emx = agg_expect[k]
        assert c == ec and mn == emn
    assert sorted(keys_got) == keys_sorted


# ---------------------------------------------------------------------------
# skew (heavy-hitter) handling — BASELINE config 4
# ---------------------------------------------------------------------------


def test_skew_join_zipf(rng, mesh):
    from database_technology_algorithms_tpu.parallel.skew import dist_hash_join_skew
    from database_technology_algorithms_tpu.parallel import dist_hash_join

    n = 4000
    build = M.random_cols(rng, 400, key_range=50)
    probe = M.random_cols(rng, n, key_range=50)
    # make key 7 a heavy hitter: half of all probe rows
    hot_rows = rng.random(n) < 0.5
    probe["num"] = np.where(hot_rows, 7, probe["num"]).astype(np.uint32)

    cfg = EngineConfig(shuffle_slack=1.5, hh_factor=4, hh_topk=8)
    tb = distribute(mesh, build)
    tp = distribute(mesh, probe)

    # plain hash-partition overflows its slots on the hot key, detects it,
    # and recovers by re-running with doubled capacity (still exact)
    from database_technology_algorithms_tpu.metrics import OperatorStats

    st = OperatorStats(op="dist_hash_join")
    _, nres_plain, ovf_plain = dist_hash_join(mesh, tb, tp, 1, cfg, stats=st)
    assert st.retries > 0  # the 1.5-slack capacity really did overflow
    assert int(ovf_plain) == 0  # ...and the retry absorbed it
    _, _, m_nres_plain = M.model_hash_join(build, probe, 1)
    assert int(nres_plain) == m_nres_plain
    # the skew-aware join needs no retry at all
    out, nres, ovf, n_hot = dist_hash_join_skew(mesh, tb, tp, 1, cfg)
    assert int(ovf) == 0
    assert int(n_hot) >= 1
    _, _, m_nres = M.model_hash_join(build, probe, 1)
    assert int(nres) == m_nres
    # DistTable.count must be uniformly (ndev,) — the r3 standalone wrapper
    # double-wrapped it to (ndev, 1), breaking collect() on future NumPy
    assert out.count.shape == (len(mesh.devices.flat),)
    # emitted rows: multiset of matched probe rows
    got = collect(out)
    m_matched, _, _ = M.model_hash_join(build, probe, 1)
    keep = [i for i, m in enumerate(m_matched) if m]
    exp = sorted(zip(probe["recid"][keep].tolist(), probe["num"][keep].tolist()))
    gotr = sorted(zip(got["recid"].tolist(), got["num"].tolist()))
    assert gotr == exp


def test_skew_join_build_side_hot(rng, mesh):
    """Build-side skew: one key holds half the BUILD rows (cold probe).

    Local dedup on the hot path collapses the duplicates before the
    broadcast, so the skew join needs no capacity retry; counts and rows
    stay exact (SURVEY.md §7 hard part #3, VERDICT r1 weak #8)."""
    from database_technology_algorithms_tpu.parallel.skew import dist_hash_join_skew

    n = 4000
    build = M.random_cols(rng, n, key_range=50)
    hot_rows = rng.random(n) < 0.5
    build["num"] = np.where(hot_rows, 9, build["num"]).astype(np.uint32)
    probe = M.random_cols(rng, 600, key_range=50)

    cfg = EngineConfig(shuffle_slack=1.5, hh_factor=4, hh_topk=8)
    tb = distribute(mesh, build)
    tp = distribute(mesh, probe)
    out, nres, ovf, n_hot = dist_hash_join_skew(mesh, tb, tp, 1, cfg)
    assert int(ovf) == 0
    assert int(n_hot) >= 1
    m_matched, _, m_nres = M.model_hash_join(build, probe, 1)
    assert int(nres) == m_nres
    got = collect(out)
    keep = [i for i, m in enumerate(m_matched) if m]
    exp = sorted(zip(probe["recid"][keep].tolist(), probe["num"][keep].tolist()))
    gotr = sorted(zip(got["recid"].tolist(), got["num"].tolist()))
    assert gotr == exp


def test_skew_join_uniform_matches_plain(rng, mesh):
    from database_technology_algorithms_tpu.parallel.skew import dist_hash_join_skew

    build = M.random_cols(rng, 500, key_range=70)
    probe = M.random_cols(rng, 600, key_range=70)
    cfg = EngineConfig(shuffle_slack=4.0)
    tb, tp = distribute(mesh, build), distribute(mesh, probe)
    out, nres, ovf, _ = dist_hash_join_skew(mesh, tb, tp, 2, cfg)
    assert int(ovf) == 0
    _, _, m_nres = M.model_hash_join(build, probe, 2)
    assert int(nres) == m_nres


# ---------------------------------------------------------------------------
# 2-D ('host','chip') mesh — the multi-host pod shape (DCN on 'host'); same
# operator code, two collective axes (SURVEY.md §7 M4 path, CPU-simulated)
# ---------------------------------------------------------------------------


def test_host_chip_mesh_ops(rng):
    from database_technology_algorithms_tpu.parallel import make_host_chip_mesh
    from database_technology_algorithms_tpu.models.pipeline import make_dist_pipeline
    from database_technology_algorithms_tpu.models.pipeline import pipeline_single

    mesh2d = make_host_chip_mesh(n_hosts=4, chips_per_host=2)
    assert mesh2d.axis_names == ("host", "chip")
    c1 = M.random_cols(rng, 800, key_range=60)
    c2 = M.random_cols(rng, 700, key_range=60)
    t1, t2 = distribute(mesh2d, c1), distribute(mesh2d, c2)
    step = make_dist_pipeline(mesh2d, 1, CFG)
    out = step(t1.batch, t1.count, t2.batch, t2.count)
    assert int(out["overflow"]) == 0
    single = pipeline_single(M.to_batch(c1), M.to_batch(c2), 1, CFG)
    for k in ("nunique_r", "nunique_s", "merge_nres", "hash_nres", "agg_groups"):
        assert int(out[k]) == int(single[k]), k


def test_host_chip_mesh_dist_ops(rng):
    from database_technology_algorithms_tpu.parallel import make_host_chip_mesh

    mesh2d = make_host_chip_mesh(n_hosts=2, chips_per_host=4)
    cols = M.random_cols(rng, 900, key_range=70)
    t = distribute(mesh2d, cols)
    out, nunique, ovf = dist_distinct(mesh2d, t, 1, CFG)
    assert int(ovf) == 0
    _, n_expect = M.model_distinct(cols, 1)
    assert int(nunique) == n_expect


def test_dest_ranks_engines_equal():
    """The sort-based rank engine (pod-scale) must equal the one-hot cumsum
    exactly, including above the auto threshold and with the drop sentinel
    destination ndev (VERDICT r2 weak #4)."""
    import jax.numpy as jnp

    from database_technology_algorithms_tpu.parallel.shuffle import _dest_ranks

    gen = np.random.default_rng(3)
    for ndev in (3, 8, 17, 64):
        n = 2000
        dest = jnp.asarray(
            gen.integers(0, ndev + 1, size=n).astype(np.int32)  # incl sentinel
        )
        c1, r1 = _dest_ranks(dest, ndev, engine="onehot")
        c2, r2 = _dest_ranks(dest, ndev, engine="sort")
        np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
        np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
        # auto engine must match whichever it picks
        c3, r3 = _dest_ranks(dest, ndev, engine="auto")
        np.testing.assert_array_equal(np.asarray(c1), np.asarray(c3))
        np.testing.assert_array_equal(np.asarray(r1), np.asarray(r3))


def test_shuffle_sort_rank_engine_end_to_end(rng, mesh):
    """A full dist op under the forced sort-rank engine equals the model."""
    cols = M.random_cols(rng, 800, key_range=50)
    cfg = EngineConfig(shuffle_slack=4.0, shuffle_rank_engine="sort")
    t = distribute(mesh, cols)
    out, nunique, ovf = dist_distinct(mesh, t, 1, cfg)
    assert int(ovf) == 0
    _, want = M.model_distinct(cols, 1)
    assert int(nunique) == want
