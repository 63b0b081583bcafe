"""The sort-placement row-movement engine (ops/movement.py place_words).

On the target TPU, XLA's row gather costs ~32 ns/row while ``lax.sort`` runs
near memory speed, so every operator materializes output rows through
grouped payload-carrying sorts keyed by destination position instead of a
gather (``cfg.materialize="sort"``; "auto" picks it on TPU).  CI runs on
CPU where "auto" resolves to the gather path, so these tests force the
placement engine explicitly and assert it is bit-identical to the gather
engine across the operator surface.

Reference hot loops being replaced: the per-record memcpy in the k-way
merge (``DatabaseProject.cpp:303-326``) and the probe-hit copy
(``:583-629``).
"""

import numpy as np
import pytest

import model as M

from database_technology_algorithms_tpu.batch import RecordBatch
from database_technology_algorithms_tpu.config import EngineConfig
from database_technology_algorithms_tpu.ops import (
    compact,
    distinct,
    hash_join,
    merge_join,
    sort_batch,
)
from database_technology_algorithms_tpu.ops.movement import (
    compaction_dest,
    place_words,
    permute_rows,
)

import jax.numpy as jnp

CFG_SORT = EngineConfig(materialize="sort")
CFG_GATHER = EngineConfig(materialize="gather")
FIELDS = [0, 1, 2, 3]


def _np(batch):
    return batch.to_numpy()


def test_place_words_is_destination_permutation(rng):
    n = 777
    dest = rng.permutation(n).astype(np.uint32)
    words = [rng.integers(0, 2**32, n, dtype=np.uint32) for _ in range(9)]
    out = place_words(jnp.asarray(dest), [jnp.asarray(w) for w in words])
    for w, o in zip(words, out):
        expect = np.empty(n, np.uint32)
        expect[dest] = w
        np.testing.assert_array_equal(np.asarray(o), expect)


def test_place_words_sparse_dest_rank_order(rng):
    # dest need not be dense: placement orders rows by dest rank
    n = 100
    dest = (rng.permutation(n) * 7 + 3).astype(np.uint32)
    w = rng.integers(0, 2**32, n, dtype=np.uint32)
    (out,) = place_words(jnp.asarray(dest), [jnp.asarray(w)])
    np.testing.assert_array_equal(np.asarray(out), w[np.argsort(dest)])


def test_permute_rows_zeroes_past_count(rng):
    cols = M.random_cols(rng, 101)
    batch = M.to_batch(cols)
    keep = rng.random(101) < 0.4
    dest, count = compaction_dest(jnp.asarray(keep))
    out = permute_rows(batch, dest, count=count)
    c = int(count)
    o = _np(out)
    np.testing.assert_array_equal(o["recid"][:c], cols["recid"][keep])
    assert np.all(o["recid"][c:] == 0)
    assert np.all(o["strs"][c:] == 0)
    assert np.all(~o["valid"][c:])


@pytest.mark.parametrize("field", FIELDS)
def test_sort_engines_agree(rng, field):
    cols = M.random_cols(rng, 263)
    batch = M.to_batch(cols)
    a, _ = sort_batch(batch, field, CFG_SORT)
    b, _ = sort_batch(batch, field, CFG_GATHER)
    for k in ("recid", "num", "strs", "valid"):
        np.testing.assert_array_equal(_np(a)[k], _np(b)[k])


@pytest.mark.parametrize("field", FIELDS)
def test_distinct_engines_agree(rng, field):
    cols = M.random_cols(rng, 263)
    batch = M.to_batch(cols)
    a, na = distinct(batch, field, CFG_SORT)
    b, nb = distinct(batch, field, CFG_GATHER)
    assert int(na) == int(nb)
    for k in ("recid", "num", "strs", "valid"):
        np.testing.assert_array_equal(_np(a)[k], _np(b)[k])


@pytest.mark.parametrize("field", FIELDS)
def test_merge_join_engines_agree(rng, field):
    r = M.to_batch(M.random_cols(rng, 210))
    s = M.to_batch(M.random_cols(rng, 190))
    a, na, _ = merge_join(r, s, field, CFG_SORT)
    b, nb, _ = merge_join(r, s, field, CFG_GATHER)
    assert int(na) == int(nb)
    for k in ("recid", "num", "strs", "valid"):
        np.testing.assert_array_equal(_np(a)[k], _np(b)[k])


@pytest.mark.parametrize("field", FIELDS)
def test_hash_join_engines_agree(rng, field):
    r = M.to_batch(M.random_cols(rng, 170))
    s = M.to_batch(M.random_cols(rng, 170))
    a, na = hash_join(r, s, field, CFG_SORT)
    b, nb = hash_join(r, s, field, CFG_GATHER)
    assert int(na) == int(nb)
    for k in ("recid", "num", "strs", "valid"):
        np.testing.assert_array_equal(_np(a)[k], _np(b)[k])


@pytest.mark.parametrize("engine", ["searchsorted", "table"])
@pytest.mark.parametrize("field", [0, 1])
def test_u32_join_engines_agree(rng, field, engine):
    from database_technology_algorithms_tpu.ops import hash_join_count

    r = M.to_batch(M.random_cols(rng, 170))
    s = M.to_batch(M.random_cols(rng, 170))
    cfg = EngineConfig(u32_join_engine=engine)
    ma, mua, na = hash_join_count(r, s, field, cfg)
    mb, mub, nb = hash_join_count(r, s, field, EngineConfig())
    assert int(na) == int(nb)
    np.testing.assert_array_equal(np.asarray(ma), np.asarray(mb))
    np.testing.assert_array_equal(np.asarray(mua), np.asarray(mub))


@pytest.mark.parametrize("field", [0, 1])
def test_u32_distinct_engine_agrees(rng, field):
    r = M.to_batch(M.random_cols(rng, 230))
    a, na = distinct(r, field, EngineConfig(u32_distinct_engine="fastpath"))
    b, nb = distinct(r, field, EngineConfig())
    assert int(na) == int(nb)
    for k in ("recid", "num", "strs", "valid"):
        np.testing.assert_array_equal(_np(a)[k], _np(b)[k])


def test_field3_device_materialization_matches_host(rng):
    from database_technology_algorithms_tpu.ops import hash_join_count
    from database_technology_algorithms_tpu.ops.hash_join import (
        materialize_field3,
        materialize_field3_device,
    )

    b = M.to_batch(M.random_cols(rng, 150, key_range=12))
    p = M.to_batch(M.random_cols(rng, 150, key_range=12))
    matched, mult, nres = hash_join_count(b, p, 3)
    host = materialize_field3(p, np.asarray(matched), np.asarray(mult))
    cap = 4 * 150
    dev, total = materialize_field3_device(p, mult, cap)
    assert int(total) == int(nres) == host.nrows
    hn, dn = host.to_numpy(), dev.to_numpy()
    for k in ("recid", "num", "strs", "valid"):
        np.testing.assert_array_equal(dn[k][: int(total)], hn[k])
    assert np.all(dn["recid"][int(total):] == 0)


def test_compact_engines_agree(rng):
    cols = M.random_cols(rng, 300)
    batch = M.to_batch(cols)
    mask = jnp.asarray(rng.random(300) < 0.3)
    a, ca = compact(batch, mask, CFG_SORT)
    b, cb = compact(batch, mask, CFG_GATHER)
    assert int(ca) == int(cb)
    for k in ("recid", "num", "strs", "valid"):
        np.testing.assert_array_equal(_np(a)[k], _np(b)[k])


def test_pipeline_single_engines_agree(rng):
    from database_technology_algorithms_tpu.models.pipeline import pipeline_single

    r = M.to_batch(M.random_cols(rng, 310))
    s = M.to_batch(M.random_cols(rng, 310))
    outs = {}
    for name, cfg in (("sort", CFG_SORT), ("gather", CFG_GATHER)):
        o = pipeline_single(r, s, 1, cfg)
        outs[name] = o
        assert int(o["merge_nres"]) == int(o["hash_nres"])
    a, b = outs["sort"], outs["gather"]
    for k in ("nunique_r", "nunique_s", "merge_nres", "hash_nres", "agg_groups"):
        assert int(a[k]) == int(b[k]), k
    for k in ("recid", "num", "strs", "valid"):
        np.testing.assert_array_equal(_np(a["join_out"])[k], _np(b["join_out"])[k])


def test_place_words_2d_matches_place_words(rng):
    from database_technology_algorithms_tpu.ops.movement import place_words_2d

    n = 1024
    dest = rng.permutation(n).astype(np.uint32)
    words = [rng.integers(0, 2**32, n, dtype=np.uint32) for _ in range(33)]
    jwords = [jnp.asarray(w) for w in words]
    base = place_words(jnp.asarray(dest), jwords)
    for npay in (1, 2, 5):
        out = place_words_2d(jnp.asarray(dest), None, jwords, npay=npay)
        for b, o in zip(base, out):
            np.testing.assert_array_equal(np.asarray(o), np.asarray(b))


def test_place_words_2d_live_count_zeroing(rng):
    from database_technology_algorithms_tpu.ops.movement import place_words_2d

    n = 512
    cnt = 100
    dest = rng.permutation(n).astype(np.uint32)
    words = [rng.integers(0, 2**32, n, dtype=np.uint32) for _ in range(4)]
    out = place_words_2d(
        jnp.asarray(dest), jnp.int32(cnt), [jnp.asarray(w) for w in words]
    )
    for w, o in zip(words, out):
        expect = np.empty(n, np.uint32)
        expect[dest] = w
        expect[cnt:] = 0
        np.testing.assert_array_equal(np.asarray(o), expect)


def test_place_grouped_model(rng):
    """place_grouped (the production materializer) against the numpy model:
    out[dest[i]] = word[i], positions >= cnt zeroed, across group
    boundaries (7-word groups + tail)."""
    from database_technology_algorithms_tpu.ops.movement import place_grouped

    n = 640
    cnt = 200
    dest = rng.permutation(n).astype(np.uint32)
    words = [rng.integers(0, 2**32, n, dtype=np.uint32) for _ in range(33)]
    jwords = [jnp.asarray(w) for w in words]
    b = place_grouped(jnp.asarray(dest), jnp.int32(cnt), jwords)
    assert len(b) == 33
    for w, o in zip(words, b):
        expect = np.empty(n, np.uint32)
        expect[dest] = w
        expect[cnt:] = 0
        np.testing.assert_array_equal(np.asarray(o), expect)


def test_bucketed_join_engine_equals_generic(rng):
    """cfg.u32_join_engine="bucketed" (Grace-style padded bucket compare)
    must match the generic engine bit-exactly on both u32 fields, including
    keys equal to the table sentinel and capacity-live-count padding."""
    import jax.numpy as jnp

    from database_technology_algorithms_tpu.config import EngineConfig
    from database_technology_algorithms_tpu.ops.hash_join import (
        hash_join_count_impl,
    )

    n_b, n_p = 700, 900
    cols_b = M.random_cols(rng, n_b, key_range=300)
    cols_p = M.random_cols(rng, n_p, key_range=300)
    b = M.to_batch(cols_b)
    p = M.to_batch(cols_p)
    # plant sentinel-valued keys on both sides (0xFFFFFFFF is the table fill)
    b = type(b)(
        recid=b.recid, num=b.num.at[3].set(jnp.uint32(0xFFFFFFFF)),
        strw=b.strw, valid=b.valid,
    )
    p = type(p)(
        recid=p.recid, num=p.num.at[7].set(jnp.uint32(0xFFFFFFFF)),
        strw=p.strw, valid=p.valid,
    )
    for field in (0, 1):
        for bc, pc in ((None, None), (jnp.int32(n_b - 50), jnp.int32(n_p - 70))):
            m1, mu1, n1 = hash_join_count_impl(
                b, p, field, EngineConfig(u32_join_engine="generic"),
                build_count=bc, probe_count=pc,
            )
            m2, mu2, n2 = hash_join_count_impl(
                b, p, field, EngineConfig(u32_join_engine="bucketed"),
                build_count=bc, probe_count=pc,
            )
            assert int(n1) == int(n2), (field, bc)
            np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
            np.testing.assert_array_equal(np.asarray(mu1), np.asarray(mu2))


def test_bucketed_join_overflow_fallback():
    """An adversarial key set that overflows a bucket must fall back to the
    generic engine (exactness over speed) — same results, no crash."""
    import jax.numpy as jnp

    from database_technology_algorithms_tpu.config import EngineConfig
    from database_technology_algorithms_tpu.ops.bucket_join import (
        _BUCKET_SLACK,
        _TARGET_MEAN,
    )
    from database_technology_algorithms_tpu.ops.hash_join import (
        hash_join_count_impl,
    )

    # every build key identical: all land in ONE bucket, count >> cap
    n = 64 * _BUCKET_SLACK * _TARGET_MEAN
    cols = {
        "recid": np.arange(n, dtype=np.uint32),
        "num": np.full(n, 77, np.uint32),
        "strs": np.zeros((n, 8), np.uint8),
        "valid": np.ones(n, bool),
    }
    b = M.to_batch(cols)
    pcols = {
        "recid": np.arange(200, dtype=np.uint32),
        "num": np.where(np.arange(200) % 2 == 0, 77, 5).astype(np.uint32),
        "strs": np.zeros((200, 8), np.uint8),
        "valid": np.ones(200, bool),
    }
    p = M.to_batch(pcols)
    m1, _, n1 = hash_join_count_impl(
        b, p, 1, EngineConfig(u32_join_engine="generic")
    )
    m2, _, n2 = hash_join_count_impl(
        b, p, 1, EngineConfig(u32_join_engine="bucketed")
    )
    assert int(n1) == int(n2) == 100
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))


def test_cross_width_join_and_hash_invariance(rng):
    """Joins between batches stored at DIFFERENT widths must be exact:
    key_hash skips zero tail words (width-invariant), concat pads, and
    comparisons read only live words.  Guards the narrow-width invariant
    end-to-end (batch.py)."""
    import jax.numpy as jnp

    from database_technology_algorithms_tpu.batch import STR_WORDS, RecordBatch
    from database_technology_algorithms_tpu.config import EngineConfig
    from database_technology_algorithms_tpu.ops.hash_join import (
        hash_join_count_impl,
    )
    from database_technology_algorithms_tpu.ops.keys import key_hash
    from database_technology_algorithms_tpu.ops.merge_join import (
        join_sorted_distinct_impl,
    )
    from database_technology_algorithms_tpu.ops.distinct import distinct_impl

    cols_b = M.random_cols(rng, 400, key_range=60)
    cols_p = M.random_cols(rng, 500, key_range=60)
    narrow_b = M.to_batch(cols_b)            # auto width
    wide_p = M.to_batch(cols_p).pad_str_words(STR_WORDS)
    same_p = M.to_batch(cols_p)
    assert narrow_b.str_words < STR_WORDS and wide_p.str_words == STR_WORDS

    for field in (2, 3):
        # width-invariant hash: same rows, different storage width
        h_narrow = np.asarray(key_hash(same_p, field))
        h_wide = np.asarray(key_hash(wide_p, field))
        np.testing.assert_array_equal(h_narrow, h_wide)

        # cross-width hash join == same-width hash join
        m1, _, n1 = hash_join_count_impl(narrow_b, wide_p, field)
        m2, _, n2 = hash_join_count_impl(narrow_b, same_p, field)
        assert int(n1) == int(n2), field
        np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))

        # cross-width merge join (distinct intersection) agrees too
        db, nb_ = distinct_impl(narrow_b, field)
        dpw, npw = distinct_impl(wide_p, field)
        dpn, npn = distinct_impl(same_p, field)
        _, j1 = join_sorted_distinct_impl(db, nb_, dpw, npw, field)
        _, j2 = join_sorted_distinct_impl(db, nb_, dpn, npn, field)
        assert int(j1) == int(j2), field


def test_packed_u32_view_sort_order(rng):
    """The 2-operand bit-packed (inact, key, iota) sort must order
    IDENTICALLY to the 3-operand form for adversarial keys (0, 1,
    0xFFFFFFFE, 0xFFFFFFFF, LSB-differing pairs) and mixed activity."""
    import jax

    from database_technology_algorithms_tpu.ops.sort import (
        packed_u32_view_sort,
    )

    n = 4000
    key = rng.integers(0, 2**32, n, dtype=np.uint32)
    key[:8] = [0, 1, 2**32 - 1, 2**32 - 2, 7, 6, 2**31, 2**31 - 1]
    inact = (rng.random(n) < 0.1).astype(np.uint32)
    jkey, jinact = jnp.asarray(key), jnp.asarray(inact)
    iota = jnp.arange(n, dtype=jnp.int32)
    ref = jax.lax.sort((jinact, jkey, iota), num_keys=3)
    s_key, perm, s_act, _ = packed_u32_view_sort(jinact, jkey)
    np.testing.assert_array_equal(np.asarray(perm), np.asarray(ref[2]))
    np.testing.assert_array_equal(np.asarray(s_key), np.asarray(ref[1]))
    np.testing.assert_array_equal(
        np.asarray(s_act), np.asarray(ref[0]) == 0
    )


@pytest.mark.parametrize("field", [0, 1])
def test_pipeline_packed_sorts_bit_equal(rng, field):
    """cfg.packed_u32_sorts=True (production) must be bit-identical to the
    plain 3-operand form across the whole pipeline: counters, aggregates,
    and the materialized join output."""
    from database_technology_algorithms_tpu.config import EngineConfig
    from database_technology_algorithms_tpu.models.pipeline import (
        pipeline_single,
    )

    c1 = M.random_cols(rng, 500, key_range=60)
    c2 = M.random_cols(rng, 450, key_range=60)
    c1["valid"][::7] = False
    a = pipeline_single(
        M.to_batch(c1), M.to_batch(c2), field, EngineConfig(packed_u32_sorts=True)
    )
    b = pipeline_single(
        M.to_batch(c1), M.to_batch(c2), field, EngineConfig(packed_u32_sorts=False)
    )
    for k in ("nunique_r", "nunique_s", "merge_nres", "hash_nres", "agg_groups"):
        assert int(a[k]) == int(b[k]), k
    an, bn = a["join_out"].to_numpy(), b["join_out"].to_numpy()
    for k in ("recid", "num", "strs", "valid"):
        np.testing.assert_array_equal(an[k], bn[k])
    for k in a["aggs"]:
        np.testing.assert_array_equal(
            np.asarray(a["aggs"][k]), np.asarray(b["aggs"][k])
        )


@pytest.mark.parametrize("field", [0, 1])
def test_hash_join_packed_sorts_bit_equal(rng, field):
    from database_technology_algorithms_tpu.config import EngineConfig
    from database_technology_algorithms_tpu.ops.hash_join import (
        hash_join_count_impl,
    )

    build = M.random_cols(rng, 700, key_range=90)
    probe = M.random_cols(rng, 900, key_range=90)
    bb, pb = M.to_batch(build), M.to_batch(probe)
    ma, mua, na = hash_join_count_impl(
        bb, pb, field, EngineConfig(packed_u32_sorts=True),
        build_count=600, probe_count=800,
    )
    mb, mub, nb_ = hash_join_count_impl(
        bb, pb, field, EngineConfig(packed_u32_sorts=False),
        build_count=600, probe_count=800,
    )
    assert int(na) == int(nb_)
    np.testing.assert_array_equal(np.asarray(ma), np.asarray(mb))
    np.testing.assert_array_equal(np.asarray(mua), np.asarray(mub))


def test_place_batch_matches_payload_words(rng):
    """place_batch (valid folded into the dest key) must equal the
    payload_words placement exactly, including the valid column and
    capacity zeroing."""
    from database_technology_algorithms_tpu.batch import RecordBatch
    from database_technology_algorithms_tpu.ops.movement import (
        place_batch,
        place_grouped,
    )

    cols = M.random_cols(rng, 600, key_range=50)
    cols["valid"][::3] = False
    b = M.to_batch(cols)
    n = b.nrows
    cnt = 400
    dest = jnp.asarray(rng.permutation(n).astype(np.uint32))
    got = place_batch(dest, jnp.int32(cnt), b)
    ref_words = place_grouped(dest, jnp.int32(cnt), b.payload_words())
    ref = RecordBatch.from_payload_words(ref_words)
    gn, rn = got.to_numpy(), ref.to_numpy()
    for k in ("recid", "num", "strs", "valid"):
        np.testing.assert_array_equal(gn[k], rn[k], err_msg=k)


@pytest.mark.parametrize("packed", [True, False])
def test_join_preserves_valid_of_live_rows(rng, packed):
    """Liveness is the count's business, valid the filter's: a LIVE row
    with valid=False that matches must keep valid=False in the join
    output under BOTH the packed direct-sort path and the permutation
    path (r4 review: the first packed cut forced valid=True)."""
    from database_technology_algorithms_tpu.ops.merge_join import (
        join_sorted_distinct_impl,
    )

    cfg = EngineConfig(materialize="sort", packed_u32_sorts=packed)
    n = 64
    r = {
        "recid": np.arange(n, dtype=np.uint32),
        "num": (np.arange(n, dtype=np.uint32) * 3),
        "strs": np.zeros((n, 8), np.uint8),
        "valid": np.ones(n, bool),
    }
    r["valid"][::4] = False  # live rows carrying valid=False
    s = {
        "recid": np.arange(n, dtype=np.uint32) + 1000,
        "num": (np.arange(n, dtype=np.uint32) * 3),  # all keys match
        "strs": np.zeros((n, 8), np.uint8),
        "valid": np.ones(n, bool),
    }
    out, nres = join_sorted_distinct_impl(
        M.to_batch(r), jnp.int32(n), M.to_batch(s), jnp.int32(n), 1, cfg
    )
    assert int(nres) == n
    o = out.to_numpy()
    # output is in key order == recid order here; valid pattern preserved
    np.testing.assert_array_equal(o["valid"][:n], r["valid"])
    np.testing.assert_array_equal(o["recid"][:n], r["recid"])


def test_over_budget_wide_key_join_routes(rng):
    """Wide string keys (stored width > 16 words) over the budget now
    ROUTE through the tiled driver: member_multiplicity switches to LSD
    stable passes (constant operand count) instead of a >30-operand
    variadic sort, so the compile cliff is avoided without refusing
    (VERDICT r4 #3c)."""
    from database_technology_algorithms_tpu.ops.hash_join import (
        hash_join_count,
    )

    g = np.random.default_rng(5)
    n = 600
    strs = np.zeros((n, 128), np.uint8)
    strs[:, :80] = g.integers(97, 123, size=(n, 80), dtype=np.uint8)
    strs[50:60] = strs[0]  # planted duplicates -> real matches
    cols = {
        "recid": np.arange(n, dtype=np.uint32),
        "num": g.integers(0, 50, n, dtype=np.uint32).astype(np.uint32),
        "strs": strs,  # 80-char strings -> 32-word bucket
        "valid": np.ones(n, bool),
    }
    b = M.to_batch(cols)
    assert b.str_words > 16
    matched, mult, nres = hash_join_count(
        b, b, 2, EngineConfig(mem_rows=256)
    )
    m_matched, m_mult, m_nres = M.model_hash_join(cols, cols, 2)
    assert int(nres) == m_nres
    np.testing.assert_array_equal(np.asarray(matched), np.asarray(m_matched))


def test_over_budget_materializing_hash_join_routes(rng):
    """hash_join (the materializing form) beyond the budget routes
    through the tiled count + chunked gather compaction (VERDICT r4 #3):
    output equals the in-budget kernel's."""
    from database_technology_algorithms_tpu.ops.hash_join import (
        hash_join, hash_join_impl,
    )

    cols = M.random_cols(rng, 600, key_range=60)
    b = M.to_batch(cols)
    out, nres = hash_join(b, b, 1, EngineConfig(mem_rows=256))
    ref, ref_nres = hash_join_impl(b, b, 1, EngineConfig(mem_rows=4096))
    assert int(nres) == int(ref_nres)
    on, rn = out.to_numpy(), ref.to_numpy()
    for k in ("recid", "num", "strs", "valid"):
        np.testing.assert_array_equal(on[k], rn[k], err_msg=k)


@pytest.mark.parametrize("field", ["0", "1"])
def test_sort_fused_k4_width_agrees(rng, field):
    """The r5 gate widening (4+K <= 8) admits K=4 string batches into the
    fused whole-record sort — equality vs the gather engine at that
    width (12-char strings -> 4-word bucket)."""
    g = np.random.default_rng(17)
    n = 500
    strs = np.zeros((n, 16), np.uint8)
    strs[:, :12] = g.integers(97, 123, size=(n, 12), dtype=np.uint8)
    cols = {
        "recid": g.permutation(n).astype(np.uint32),
        "num": g.integers(0, 60, n, dtype=np.uint32).astype(np.uint32),
        "strs": strs,
        "valid": g.random(n) > 0.1,
    }
    batch = M.to_batch(cols)
    assert batch.str_words == 4
    from database_technology_algorithms_tpu.ops.sort import sort_batch

    a, pa = sort_batch(batch, field, CFG_SORT)
    b, pb = sort_batch(batch, field, CFG_GATHER)
    np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))
    for k in ("recid", "num", "strs", "valid"):
        np.testing.assert_array_equal(a.to_numpy()[k], b.to_numpy()[k], k)
    # live-count form too
    a2, pa2 = sort_batch(batch, field, CFG_SORT, count=300)
    b2, pb2 = sort_batch(batch, field, CFG_GATHER, count=300)
    np.testing.assert_array_equal(np.asarray(pa2), np.asarray(pb2))
