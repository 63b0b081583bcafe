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
        hash_join_count_impl,
    )

    build = M.random_cols(rng, 1700, key_range=200)
    probe = M.random_cols(rng, 2300, key_range=200)
    bb, pb = M.to_batch(build), M.to_batch(probe)
    tiny = EngineConfig(mem_rows=512)  # forces >= 16 tiles
    matched, mult, nres = hash_join_count_impl(bb, pb, field, tiny)
    m_matched, m_mult, m_nres = M.model_hash_join(build, probe, field)
    assert int(nres) == m_nres
    np.testing.assert_array_equal(np.asarray(matched), np.asarray(m_matched))
    np.testing.assert_array_equal(np.asarray(mult), np.asarray(m_mult))
    # live-count convention honored under tiling too
    matched2, _, nres2 = hash_join_count_impl(
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
        hash_join_count_impl,
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
    matched, _, nres = hash_join_count_impl(bb, pb, 2, tiny)
    m_matched, _, m_nres = M.model_hash_join(build, probe, 2)
    assert int(nres) == m_nres
    np.testing.assert_array_equal(np.asarray(matched), np.asarray(m_matched))
