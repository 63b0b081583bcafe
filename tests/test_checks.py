"""Invariant-guard (sanitizer) tests — utils/checks.py."""

import numpy as np
import pytest

import model as M

import jax.numpy as jnp

from database_technology_algorithms_tpu.batch import RecordBatch
from database_technology_algorithms_tpu.utils.checks import (
    assert_batch,
    check_batch,
    checked_take,
)


def test_healthy_batch_passes(rng):
    b = M.to_batch(M.random_cols(rng, 64))
    assert check_batch(b, count=10) == []
    assert_batch(b, count=64)


def test_bad_count_flagged(rng):
    b = M.to_batch(M.random_cols(rng, 16))
    assert any("live count" in p for p in check_batch(b, count=17))


def test_nul_normalization_violation_flagged(rng):
    b = M.to_batch(M.random_cols(rng, 8))
    # corrupt: put a byte after a NUL in row 0 (bypass normalization)
    strw = np.asarray(b.strw).copy()
    strw[0, :] = 0
    strw[0, 5] = 0x41  # byte 20ish, after NULs
    bad = RecordBatch(recid=b.recid, num=b.num, strw=jnp.asarray(strw), valid=b.valid)
    assert any("NUL" in p for p in check_batch(bad))
    with pytest.raises(AssertionError):
        assert_batch(bad)


def test_checked_take_errors_on_oob(rng):
    import jax
    from jax.experimental import checkify

    col = jnp.arange(10, dtype=jnp.uint32)

    def f(idx):
        return checked_take(col, idx, upper=9)

    cf = checkify.checkify(jax.jit(f))
    err, out = cf(jnp.array([0, 5, 9]))
    err.throw()  # no error
    err, out = cf(jnp.array([0, 5, 12]))
    with pytest.raises(Exception):
        err.throw()


def test_device_memory_budget_gate():
    """The nmem_blocks heir: in-memory operators refuse inputs beyond
    cfg.mem_rows with a pointer to the external drivers (the reference
    HashJoin's unbounded build table is a bug, not a capability —
    DatabaseProject.cpp:510-548)."""
    import pytest

    from database_technology_algorithms_tpu.config import EngineConfig
    from database_technology_algorithms_tpu.io.generator import generate_batch
    from database_technology_algorithms_tpu.ops.distinct import distinct_impl
    from database_technology_algorithms_tpu.ops.sort import sort_batch_impl
    from database_technology_algorithms_tpu.utils.checks import MemoryBudgetError

    b = generate_batch(2, seed=0)  # 200 rows
    tiny = EngineConfig(mem_rows=100)
    with pytest.raises(MemoryBudgetError):
        sort_batch_impl(b, 1, tiny)
    with pytest.raises(MemoryBudgetError):
        distinct_impl(b, 1, tiny)
    # within budget: fine
    ok = EngineConfig(mem_rows=1000)
    out, n = distinct_impl(b, 1, ok)
    assert int(n) > 0


@pytest.mark.parametrize("field", [1, 3])
def test_hash_join_over_budget_tiles(rng, field):
    """hash_join_count beyond cfg.mem_rows ROUTES through device-tiled
    passes instead of refusing (VERDICT r3 #7): results equal the
    in-budget kernel and the model at mem_rows << n."""
    import numpy as np

    import model as M
    from database_technology_algorithms_tpu.config import EngineConfig
    from database_technology_algorithms_tpu.ops.hash_join import (
        hash_join_count,
    )

    build = M.random_cols(rng, 1700, key_range=200)
    probe = M.random_cols(rng, 2300, key_range=200)
    bb, pb = M.to_batch(build), M.to_batch(probe)
    tiny = EngineConfig(mem_rows=512)  # forces >= 16 tiles
    matched, mult, nres = hash_join_count(bb, pb, field, tiny)
    m_matched, m_mult, m_nres = M.model_hash_join(build, probe, field)
    assert int(nres) == m_nres
    np.testing.assert_array_equal(np.asarray(matched), np.asarray(m_matched))
    np.testing.assert_array_equal(np.asarray(mult), np.asarray(m_mult))
    # live-count convention honored under tiling too
    matched2, _, nres2 = hash_join_count(
        bb, pb, field, tiny,
        build_count=900, probe_count=1100,
    )
    build_c = {k: v[:900] for k, v in build.items()}
    probe_c = {k: v[:1100] for k, v in probe.items()}
    _, _, m_nres2 = M.model_hash_join(build_c, probe_c, field)
    assert int(nres2) == m_nres2


def test_hash_join_over_budget_tiles_cross_width(rng):
    """Tiled over-budget join with CROSS-WIDTH string keys (build stored
    at 2 words, probe at 4): the key-word lists must zero-pad to a common
    width — the r4 review caught a silent common-prefix truncation."""
    import numpy as np

    import model as M
    from database_technology_algorithms_tpu.batch import RecordBatch
    from database_technology_algorithms_tpu.config import EngineConfig
    from database_technology_algorithms_tpu.ops.hash_join import (
        hash_join_count,
    )

    g = np.random.default_rng(9)
    nb, npr = 900, 1200
    # probe strings 12 chars (4-word bucket); build 5 chars (2-word bucket)
    # with several probe strings sharing the build's first 8 chars exactly
    bs = np.zeros((nb, 8), np.uint8)
    bs[:, :5] = g.integers(97, 123, size=(nb, 5), dtype=np.uint8)
    ps = np.zeros((npr, 16), np.uint8)
    ps[:, :12] = g.integers(97, 123, size=(npr, 12), dtype=np.uint8)
    # plant: probe rows 0-49 share build row 0's 5 chars then continue
    ps[:50, :5] = bs[0, :5]
    ps[:50, 5:12] = g.integers(97, 123, size=(50, 7), dtype=np.uint8)
    # plant true matches: probe rows 50-59 equal build row 1 exactly
    ps[50:60] = 0
    ps[50:60, :5] = bs[1, :5]
    build = {
        "recid": np.arange(nb, dtype=np.uint32),
        "num": g.integers(0, 100, nb, dtype=np.uint32).astype(np.uint32),
        "strs": bs,
        "valid": np.ones(nb, bool),
    }
    probe = {
        "recid": np.arange(npr, dtype=np.uint32),
        "num": g.integers(0, 100, npr, dtype=np.uint32).astype(np.uint32),
        "strs": ps,
        "valid": np.ones(npr, bool),
    }
    bb = RecordBatch.from_numpy(**build)
    pb = RecordBatch.from_numpy(**probe)
    assert bb.str_words == 2 and pb.str_words == 4  # genuinely cross-width
    tiny = EngineConfig(mem_rows=512)  # forces the tiled path
    matched, _, nres = hash_join_count(bb, pb, 2, tiny)
    m_matched, _, m_nres = M.model_hash_join(build, probe, 2)
    assert int(nres) == m_nres
    np.testing.assert_array_equal(np.asarray(matched), np.asarray(m_matched))


@pytest.mark.parametrize("field", [1, 2, 3])
def test_sort_batch_over_budget_routes(rng, field):
    """Library sort_batch beyond cfg.mem_rows routes through the chunked
    two-pass driver (ops/chunked.py) instead of raising (VERDICT r4 #3b):
    bit-identical to the in-budget kernel, perm included."""
    import numpy as np

    import model as M
    from database_technology_algorithms_tpu.config import EngineConfig
    from database_technology_algorithms_tpu.ops.sort import sort_batch

    cols = M.random_cols(rng, 2300, key_range=150)
    b = M.to_batch(cols)
    tiny = EngineConfig(mem_rows=512)
    big = EngineConfig(mem_rows=1 << 20)
    out, perm = sort_batch(b, field, tiny)
    ref, ref_perm = sort_batch(b, field, big)
    np.testing.assert_array_equal(np.asarray(perm), np.asarray(ref_perm))
    on, rn = out.to_numpy(), ref.to_numpy()
    for k in ("recid", "num", "strs", "valid"):
        np.testing.assert_array_equal(on[k], rn[k], err_msg=k)
    # live-count convention: padding past count sinks to the tail
    out2, perm2 = sort_batch(b, field, tiny, count=900)
    ref2, ref_perm2 = sort_batch(b, field, big, count=900)
    np.testing.assert_array_equal(np.asarray(perm2), np.asarray(ref_perm2))


@pytest.mark.parametrize("field", [1, 2])
def test_distinct_over_budget_routes(rng, field):
    """Library distinct beyond cfg.mem_rows routes through the chunked
    driver: same survivors, same zero-padded capacity batch."""
    import numpy as np

    import model as M
    from database_technology_algorithms_tpu.config import EngineConfig
    from database_technology_algorithms_tpu.ops.distinct import distinct

    cols = M.random_cols(rng, 2300, key_range=150)
    b = M.to_batch(cols)
    out, nu = distinct(b, field, EngineConfig(mem_rows=512))
    ref, ref_nu = distinct(b, field, EngineConfig(mem_rows=1 << 20))
    assert int(nu) == int(ref_nu)
    on, rn = out.to_numpy(), ref.to_numpy()
    for k in ("recid", "num", "strs", "valid"):
        np.testing.assert_array_equal(on[k], rn[k], err_msg=k)


def test_staged_pipeline_over_budget_routes(rng):
    """make_pipeline_staged beyond cfg.mem_rows composes the unbounded
    ops at host level: same counters and join output as in-budget."""
    import numpy as np

    import model as M
    from database_technology_algorithms_tpu.config import EngineConfig
    from database_technology_algorithms_tpu.models.pipeline import (
        make_pipeline_staged,
    )

    r = M.to_batch(M.random_cols(rng, 1100, key_range=130))
    s = M.to_batch(M.random_cols(rng, 1300, key_range=130))
    out = make_pipeline_staged(1, EngineConfig(mem_rows=512))(r, s)
    ref = make_pipeline_staged(1, EngineConfig(mem_rows=1 << 20))(r, s)
    for k in ("nunique_r", "nunique_s", "merge_nres", "hash_nres",
              "agg_groups", "join_count"):
        assert int(out[k]) == int(ref[k]), k
    on, rn = out["join_out"].to_numpy(), ref["join_out"].to_numpy()
    for k in ("recid", "num", "strs", "valid"):
        np.testing.assert_array_equal(on[k], rn[k], err_msg=k)


def test_tiled_join_reservation_no_fallback_branch(rng):
    """The over-budget tiled join program contains NO traced whole-table
    fallback (r4's lax.cond made XLA reserve whole-table sort temporaries
    even when the tiled branch ran — VERDICT r4 #3a): the lowered program
    has no conditional, and the overflow retry lives above jit."""
    import jax
    import jax.numpy as jnp

    import model as M
    from database_technology_algorithms_tpu.config import EngineConfig
    from database_technology_algorithms_tpu.ops.hash_join import (
        _tiled_count_impl,
    )

    b = M.to_batch(M.random_cols(rng, 1700, key_range=200))
    p = M.to_batch(M.random_cols(rng, 2300, key_range=200))
    tiny = EngineConfig(mem_rows=512)
    lowered = jax.jit(
        lambda bb, pp: _tiled_count_impl(bb, pp, 1, tiny, None, None, 1)
    ).lower(b, p)
    txt = lowered.as_text()
    assert "stablehlo.case" not in txt and "stablehlo.if" not in txt
    # the bounded scan loop IS present (the tiled pass structure)
    assert "stablehlo.while" in txt
    # if the backend reports memory analysis, temporaries stay far below
    # a whole-table multi-operand sort's footprint
    try:
        mem = lowered.compile().memory_analysis()
    except Exception:
        mem = None
    if mem is not None and getattr(mem, "temp_size_in_bytes", 0):
        n = b.nrows + p.nrows
        assert mem.temp_size_in_bytes < 64 * 4 * n


def test_chunked_driver_duplicate_heavy(rng):
    """Adversarial splitter collapse: one dominant key (Zipf-extreme)
    forces the chunked driver's oversized-range handling — the all-equal
    stream path must preserve global index order and the distinct seam
    must count the dominant key once."""
    import numpy as np

    import model as M
    from database_technology_algorithms_tpu.config import EngineConfig
    from database_technology_algorithms_tpu.ops.distinct import distinct
    from database_technology_algorithms_tpu.ops.sort import sort_batch

    g = np.random.default_rng(11)
    n = 3000
    num = np.full(n, 7, np.uint32)
    other = g.integers(0, 40, n // 10, dtype=np.uint32).astype(np.uint32)
    num[: n // 10] = other  # 90% of rows share key 7
    cols = {
        "recid": np.arange(n, dtype=np.uint32),
        "num": num,
        "strs": np.zeros((n, 8), np.uint8),
        "valid": np.ones(n, bool),
    }
    b = M.to_batch(cols)
    tiny = EngineConfig(mem_rows=400)
    big = EngineConfig(mem_rows=1 << 20)
    out, perm = sort_batch(b, 1, tiny)
    ref, ref_perm = sort_batch(b, 1, big)
    np.testing.assert_array_equal(np.asarray(perm), np.asarray(ref_perm))
    d_out, nu = distinct(b, 1, tiny)
    d_ref, nu_ref = distinct(b, 1, big)
    assert int(nu) == int(nu_ref)
    on, rn = d_out.to_numpy(), d_ref.to_numpy()
    for k in ("recid", "num", "strs", "valid"):
        np.testing.assert_array_equal(on[k], rn[k], err_msg=k)


def test_staged_pipeline_over_budget_honors_valid(rng):
    """r5 review finding (CONFIRMED): the over-budget composition must
    apply the valid-predicate selection filter exactly like the
    in-budget view sort — a valid=False row must not join or count."""
    import numpy as np

    import model as M
    from database_technology_algorithms_tpu.config import EngineConfig
    from database_technology_algorithms_tpu.models.pipeline import (
        make_pipeline_staged,
    )

    rc = M.random_cols(rng, 1100, key_range=130)
    sc = M.random_cols(rng, 1300, key_range=130)
    rc["num"][5] = 999
    rc["valid"][5] = False  # invalid row with an otherwise-matching key
    sc["num"][7] = 999
    rc["valid"][40:60] = False
    sc["valid"][100:140] = False
    r, s = M.to_batch(rc), M.to_batch(sc)
    out = make_pipeline_staged(1, EngineConfig(mem_rows=512))(r, s)
    ref = make_pipeline_staged(1, EngineConfig(mem_rows=1 << 20))(r, s)
    for k in ("nunique_r", "nunique_s", "merge_nres", "hash_nres",
              "agg_groups", "join_count"):
        assert int(out[k]) == int(ref[k]), k
    on, rn = out["join_out"].to_numpy(), ref["join_out"].to_numpy()
    for k in ("recid", "num", "strs", "valid"):
        np.testing.assert_array_equal(on[k], rn[k], err_msg=k)
