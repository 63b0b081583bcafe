"""Property tests: device operators vs the pure-python semantic model."""

import numpy as np
import pytest

import model as M

from database_technology_algorithms_tpu.config import EngineConfig
from database_technology_algorithms_tpu.ops import (
    compact,
    distinct,
    filter_batch,
    group_aggregate,
    hash_join,
    hash_join_count,
    is_sorted,
    merge_join,
    sort_batch,
)
from database_technology_algorithms_tpu.ops import filter as F

FIELDS = [0, 1, 2, 3]
CFG = EngineConfig(str_prefix_words=2)
CFG_EXACT = EngineConfig(str_prefix_words=32)


def _cols_of(batch, n):
    out = batch.to_numpy()
    return {k: v[:n] for k, v in out.items()}


@pytest.mark.parametrize("field", FIELDS)
@pytest.mark.parametrize("cfg", [CFG, CFG_EXACT], ids=["prefix2", "exact"])
def test_sort_matches_model(rng, field, cfg):
    cols = M.random_cols(rng, 257)
    batch = M.to_batch(cols)
    sorted_b, perm = sort_batch(batch, field, cfg)
    expect = M.model_sort_perm(cols, field)
    np.testing.assert_array_equal(np.asarray(perm), np.asarray(expect))
    assert bool(is_sorted(sorted_b, field))


@pytest.mark.parametrize("field", FIELDS)
def test_sort_char_field_selector(rng, field):
    # the reference API passes field as char '0'..'3' (main.cpp:114,121)
    cols = M.random_cols(rng, 64)
    batch = M.to_batch(cols)
    _, perm_c = sort_batch(batch, str(field), CFG)
    _, perm_i = sort_batch(batch, field, CFG)
    np.testing.assert_array_equal(np.asarray(perm_c), np.asarray(perm_i))


@pytest.mark.parametrize("field", FIELDS)
def test_distinct_matches_model(rng, field):
    cols = M.random_cols(rng, 300)
    batch = M.to_batch(cols)
    out, nunique = distinct(batch, field, CFG)
    idx, n_expect = M.model_distinct(cols, field)
    assert int(nunique) == n_expect
    got = _cols_of(out, n_expect)
    np.testing.assert_array_equal(got["recid"], cols["recid"][idx])
    np.testing.assert_array_equal(got["num"], cols["num"][idx])
    np.testing.assert_array_equal(got["strs"], cols["strs"][idx])


@pytest.mark.parametrize("field", FIELDS)
def test_merge_join_matches_model(rng, field):
    r = M.random_cols(rng, 211)
    s = M.random_cols(rng, 173)
    out, nres, stats = merge_join(M.to_batch(r), M.to_batch(s), field, CFG)
    idx, n_expect = M.model_merge_join(r, s, field)
    assert int(nres) == n_expect
    got = _cols_of(out, n_expect)
    np.testing.assert_array_equal(got["recid"], r["recid"][idx])
    np.testing.assert_array_equal(got["num"], r["num"][idx])
    np.testing.assert_array_equal(got["strs"], r["strs"][idx])
    _, nu_r = M.model_distinct(r, field)
    assert int(stats["nunique_r"]) == nu_r


@pytest.mark.parametrize("field", FIELDS)
def test_hash_join_matches_model(rng, field):
    build = M.random_cols(rng, 157)
    probe = M.random_cols(rng, 259)
    matched, mult, nres = hash_join_count(
        M.to_batch(build), M.to_batch(probe), field, CFG
    )
    m_matched, m_mult, m_nres = M.model_hash_join(build, probe, field)
    assert int(nres) == m_nres
    np.testing.assert_array_equal(np.asarray(matched), np.asarray(m_matched))
    np.testing.assert_array_equal(np.asarray(mult), np.asarray(m_mult))

    out, nres2 = hash_join(M.to_batch(build), M.to_batch(probe), field, CFG)
    assert int(nres2) == m_nres
    # emitted rows = matched probe rows in probe order
    keep = [i for i, m in enumerate(m_matched) if m]
    got = _cols_of(out, len(keep))
    np.testing.assert_array_equal(got["recid"], probe["recid"][keep])
    np.testing.assert_array_equal(got["strs"], probe["strs"][keep])


def test_hash_join_field3_multiplicity(rng):
    # build-side duplicate (num,str) pairs multiply the probe emission
    # (reference multimap behavior, DatabaseProject.cpp:619-628)
    build = M.random_cols(rng, 40, key_range=3, str_pool=[b"x", b"y"])
    probe = M.random_cols(rng, 25, key_range=3, str_pool=[b"x", b"y"])
    _, mult, nres = hash_join_count(M.to_batch(build), M.to_batch(probe), 3, CFG)
    _, m_mult, m_nres = M.model_hash_join(build, probe, 3)
    assert int(nres) == m_nres > 0
    np.testing.assert_array_equal(np.asarray(mult), np.asarray(m_mult))


def test_filter_and_compact(rng):
    cols = M.random_cols(rng, 123)
    batch = M.to_batch(cols)
    out, count = filter_batch(batch, F.pred_num_range(10, 30))
    mask = (cols["num"] >= 10) & (cols["num"] < 30)
    assert int(count) == mask.sum()
    got = _cols_of(out, int(count))
    np.testing.assert_array_equal(got["num"], cols["num"][mask])

    out2, c2 = filter_batch(batch, F.pred_str_eq(b"Hola"))
    expect = [i for i in range(123) if M.cstr(cols["strs"][i]) == b"Hola"]
    assert int(c2) == len(expect)

    # valid-flag predicate (the reference's selection mechanism, dbtproj.h:24)
    cols["valid"][::3] = False
    b3 = M.to_batch(cols)
    out3, c3 = filter_batch(b3, F.pred_valid())
    assert int(c3) == int(cols["valid"].sum())


@pytest.mark.parametrize("field", FIELDS)
def test_group_aggregate(rng, field):
    cols = M.random_cols(rng, 200, key_range=13)
    reps, aggs, n_groups = group_aggregate(M.to_batch(cols), field, CFG)
    agg_expect, keys_sorted = M.model_group_aggregate(cols, field)
    assert int(n_groups) == len(keys_sorted)
    reps_cols = _cols_of(reps, len(keys_sorted))
    got_keys = [M.key_of(reps_cols, i, field) for i in range(len(keys_sorted))]
    assert got_keys == keys_sorted
    counts = np.asarray(aggs["count"])[: len(keys_sorted)]
    mins = np.asarray(aggs["min"])[: len(keys_sorted)]
    maxs = np.asarray(aggs["max"])[: len(keys_sorted)]
    for i, k in enumerate(keys_sorted):
        c, s, mn, mx = agg_expect[k]
        assert counts[i] == c
        assert mins[i] == mn
        assert maxs[i] == mx


def test_empty_and_single_row():
    cols = M.random_cols(np.random.default_rng(0), 1)
    b = M.to_batch(cols)
    sorted_b, perm = sort_batch(b, 1, CFG)
    assert sorted_b.nrows == 1
    out, n = distinct(b, 2, CFG)
    assert int(n) == 1


def test_hash_table_join_matches_model(rng):
    from database_technology_algorithms_tpu.ops.hash_table import (
        build_hash_set,
        hash_join_count_table,
        probe_hash_set,
    )
    import jax.numpy as jnp

    build = M.random_cols(rng, 500, key_range=200)
    probe = M.random_cols(rng, 700, key_range=200)
    for field in (0, 1):
        hit, mult, nres = hash_join_count_table(
            M.to_batch(build), M.to_batch(probe), field
        )
        m_matched, m_mult, m_nres = M.model_hash_join(build, probe, field)
        assert int(nres) == m_nres
        np.testing.assert_array_equal(np.asarray(hit), np.asarray(m_matched))

    # direct set ops, incl. the EMPTY-sentinel edge (key hashing to 0xFFFF..)
    keys = jnp.asarray(np.array([0, 1, 2, 0xFFFFFFFF, 7, 7, 7], np.uint32))
    table, nfail = build_hash_set(keys, 32)
    assert int(nfail) == 0
    probe_keys = jnp.asarray(np.array([0, 3, 0xFFFFFFFF, 7, 8], np.uint32))
    found = probe_hash_set(table, probe_keys)
    assert list(np.asarray(found)) == [True, False, True, True, False]


def test_hash_table_with_counts(rng):
    from database_technology_algorithms_tpu.ops.hash_table import hash_join_count_table
    import jax.numpy as jnp

    build = M.random_cols(rng, 300, key_range=60)
    probe = M.random_cols(rng, 300, key_range=60)
    bc, pc = 120, 150
    live_build = {k: v[:bc] for k, v in build.items()}
    live_probe = {k: v[:pc] for k, v in probe.items()}
    hit, _, nres = hash_join_count_table(
        M.to_batch(build), M.to_batch(probe), 1,
        build_count=jnp.int32(bc), probe_count=jnp.int32(pc),
    )
    _, _, m_nres = M.model_hash_join(live_build, live_probe, 1)
    assert int(nres) == m_nres


def test_pred_str_eq_embedded_nul(rng):
    """strcmp==0 semantics: bytes after an embedded NUL in the CONSTANT are
    invisible, exactly as they are in ingested strings (r4 review)."""
    from database_technology_algorithms_tpu.ops.filter import (
        filter_batch,
        pred_str_eq,
    )

    cols = M.random_cols(rng, 200, key_range=30)
    b = M.to_batch(cols)
    want = sum(1 for s in M.to_batch(cols).str_list() if s == b"Hola")
    _, n1 = filter_batch(b, pred_str_eq(b"Hola"))
    _, n2 = filter_batch(b, pred_str_eq(b"Hola\x00garbage"))
    assert int(n1) == int(n2) == want


def test_compact_count_gates_padding(rng):
    """Capacity-padding rows (zeroed) must not satisfy predicates when the
    live count is provided (r4 review: distinct output + num-range filter
    emitted garbage zero rows)."""
    from database_technology_algorithms_tpu.ops.distinct import distinct
    from database_technology_algorithms_tpu.ops.filter import (
        filter_batch,
        pred_num_range,
    )

    cols = M.random_cols(rng, 300, key_range=40)
    cols["num"] = (cols["num"] + 1).astype(np.uint32)  # keep 0 out of live keys
    d, k = distinct(M.to_batch(cols), 1)
    out, n = filter_batch(d, pred_num_range(hi=20), count=k)
    d_idx, _ = M.model_distinct(cols, 1)
    want = sum(1 for i in d_idx if cols["num"][i] < 20)
    assert int(n) == want
    o = out.to_numpy()
    assert np.all(o["num"][: int(n)] > 0)  # no zero-padding survivors


def test_distinct_active_and_count_compose(rng):
    """Passing BOTH a predicate mask and a live count intersects them
    (r4 review: count was silently dropped when active was given)."""
    import jax.numpy as jnp

    from database_technology_algorithms_tpu.config import EngineConfig
    from database_technology_algorithms_tpu.ops.distinct import distinct_view

    cols = M.random_cols(rng, 300, key_range=40)
    cols["num"] = (cols["num"] + 1).astype(np.uint32)
    b = M.to_batch(cols)
    live = 200
    pred = np.asarray(cols["num"]) < 25
    _, keep_sorted = distinct_view(
        b, 1, EngineConfig(), active=jnp.asarray(pred), count=jnp.int32(live)
    )
    n = jnp.sum(keep_sorted)
    live_cols = {k: v[:live] for k, v in cols.items()}
    keep = pred[:live]
    filt = {k: v[:live][keep] for k, v in live_cols.items()}
    _, want = M.model_distinct(filt, 1)
    assert int(n) == want
