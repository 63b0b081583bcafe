"""External (out-of-core) sort/distinct driver tests."""

import numpy as np
import pytest

import model as M

from database_technology_algorithms_tpu.external import (
    SegmentStore,
    blockfile_chunks,
    external_sort,
)
from database_technology_algorithms_tpu.io.blockfile import write_blockfile
from database_technology_algorithms_tpu.io.generator import generate_columns
from database_technology_algorithms_tpu.metrics import OperatorStats


def _chunks_of(cols, size):
    n = len(cols["recid"])
    for i in range(0, n, size):
        yield {k: v[i : i + size] for k, v in cols.items()}


@pytest.mark.parametrize("field", [0, 1, 2])
def test_external_sort_matches_model(rng, tmp_path, field):
    cols = M.random_cols(rng, 3000, key_range=200)
    stats = OperatorStats()
    out = list(
        external_sort(
            _chunks_of(cols, 512), field, str(tmp_path / "spill"),
            mem_rows=512, stats=stats,
        )
    )
    merged = {k: np.concatenate([c[k] for c in out]) for k in out[0]}
    assert len(merged["recid"]) == 3000
    keys = M.all_keys(merged, field)
    assert keys == sorted(M.all_keys(cols, field))
    # multi-segment external run: 2 passes, ceil(3000/512)=6 segments
    assert stats.nsorted_segs == 6
    assert stats.npasses == 2
    assert stats.bytes_host > 0
    # out-of-core discipline: pass 2 never held more than a budgeted range
    # in host RAM (ranges are sized so a balanced range is half the budget)
    assert 0 < stats.peak_range_rows <= 512


def test_external_sort_bounded_ranges_large(rng, tmp_path):
    """Dataset 20x the memory budget: every pass-2 range stays within it.

    Guards the bounded-buffer contract of the reference's nmem_blocks
    (DatabaseProject.cpp:245-369) — pass 2 must stream ranges from disk,
    not load all segments (the round-1 implementation did)."""
    cols = M.random_cols(rng, 5000, key_range=5000)
    stats = OperatorStats()
    out = list(
        external_sort(
            _chunks_of(cols, 250), 1, str(tmp_path / "big"),
            mem_rows=250, stats=stats,
        )
    )
    merged = {k: np.concatenate([c[k] for c in out]) for k in out[0]}
    assert M.all_keys(merged, 1) == sorted(M.all_keys(cols, 1))
    assert stats.nsorted_segs == 20
    assert 0 < stats.peak_range_rows <= 250


def test_external_sort_single_chunk(rng, tmp_path):
    cols = M.random_cols(rng, 400, key_range=50)
    stats = OperatorStats()
    out = list(
        external_sort(
            _chunks_of(cols, 1024), 1, str(tmp_path / "s"), mem_rows=1024,
            stats=stats,
        )
    )
    assert stats.npasses == 1
    merged = {k: np.concatenate([c[k] for c in out]) for k in out[0]}
    assert M.all_keys(merged, 1) == sorted(M.all_keys(cols, 1))


@pytest.mark.parametrize("field", [1, 2])
def test_external_distinct(rng, tmp_path, field):
    cols = M.random_cols(rng, 2000, key_range=40)
    out = list(
        external_sort(
            _chunks_of(cols, 300), field, str(tmp_path / "d"), mem_rows=300,
            distinct=True,
        )
    )
    merged = {k: np.concatenate([c[k] for c in out]) for k in out[0]}
    idx, nunique = M.model_distinct(cols, field)
    assert len(merged["recid"]) == nunique
    assert M.all_keys(merged, field) == sorted(set(M.all_keys(cols, field)))


def test_external_sort_from_blockfile(rng, tmp_path):
    cols = generate_columns(20, seed=11)
    path = str(tmp_path / "in.bin")
    write_blockfile(path, cols)
    out = list(
        external_sort(
            blockfile_chunks(path, 700), 1, str(tmp_path / "bf"), mem_rows=700
        )
    )
    merged = {k: np.concatenate([c[k] for c in out]) for k in out[0]}
    nums = merged["num"].astype(np.int64)
    assert len(nums) == 2000
    assert np.all(np.diff(nums) >= 0)
    np.testing.assert_array_equal(np.sort(cols["num"]), merged["num"])


def test_external_sort_resume(rng, tmp_path):
    """Checkpoint/resume: re-running after a partial pass skips spilled
    segments (the reference's segment files as resumable state, SURVEY §5)."""
    cols = M.random_cols(rng, 1200, key_range=100)
    spill = str(tmp_path / "r")

    # run pass 1 manually by consuming the generator only partially
    gen = external_sort(_chunks_of(cols, 256), 1, spill, mem_rows=256)
    first = next(gen)
    del gen  # abandon mid-run: segments + manifest remain on disk
    store = SegmentStore(spill)
    assert len(store.manifest["segments"]) >= 1

    # resume: same input stream, same spill dir — completes and is correct
    out = list(external_sort(_chunks_of(cols, 256), 1, spill, mem_rows=256))
    merged = {k: np.concatenate([c[k] for c in out]) for k in out[0]}
    assert M.all_keys(merged, 1) == sorted(M.all_keys(cols, 1))


def test_external_sort_splitter_miss_resplit(tmp_path):
    """Adversarial splitter-sample miss (VERDICT r2 weak #3): a huge run of
    one duplicated key collapses adjacent sample splitters, so one pass-2
    range holds BOTH the hot key and many distinct keys — far more rows than
    mem_rows.  The engine must re-split by the range's own spilled keys:
    global key order AND the bounded-buffer contract must both hold (the
    round-2 code sorted such a range in independent sub-chunks and emitted
    unsorted output)."""
    mem = 512
    lows = np.arange(50, dtype=np.uint32)  # distinct keys below the hot key
    hot = np.full(1400, 100, dtype=np.uint32)  # > 2*mem duplicates of one key
    highs = np.arange(200, 1200, dtype=np.uint32)  # distinct keys above
    num = np.concatenate([lows, hot, highs])
    n = len(num)
    # interleave so every spilled segment holds lows, hots and highs — the
    # order violation in the old sub-chunk path needs cross-segment mixing
    perm = np.random.default_rng(7).permutation(n)
    num = num[perm]
    cols = {
        "recid": np.arange(n, dtype=np.uint32),
        "num": num,
        "strs": np.zeros((n, 8), dtype=np.uint8),
        "valid": np.ones(n, dtype=bool),
    }
    stats = OperatorStats()
    out = list(
        external_sort(
            _chunks_of(cols, mem), 1, str(tmp_path / "adv"), mem_rows=mem,
            stats=stats,
        )
    )
    merged = {k: np.concatenate([c[k] for c in out]) for k in out[0]}
    assert len(merged["recid"]) == n
    nums = merged["num"].astype(np.int64)
    assert np.all(np.diff(nums) >= 0), "global key order violated"
    np.testing.assert_array_equal(np.sort(num), merged["num"])
    # bounded-buffer contract: no device sort saw more than mem_rows rows
    assert 0 < stats.peak_range_rows <= mem


# ---------------------------------------------------------------------------
# external (bounded-memory) joins — the reference MergeJoin is external
# end-to-end (DatabaseProject.cpp:384-502); VERDICT r3 missing #1
# ---------------------------------------------------------------------------

from database_technology_algorithms_tpu.external import (  # noqa: E402
    external_hash_join,
    external_merge_join,
)


@pytest.mark.parametrize("field", [1, 2])
def test_external_merge_join_parity(rng, tmp_path, field):
    """mem_rows << input rows: distinct-key intersection must equal the
    model, emit in global key order, and never exceed the device budget."""
    r = M.random_cols(rng, 2500, key_range=400)
    s = M.random_cols(rng, 2200, key_range=400)
    mem = 600
    stats = OperatorStats()
    out = list(
        external_merge_join(
            _chunks_of(r, mem // 2), _chunks_of(s, mem // 2), field,
            str(tmp_path / "mj"), mem_rows=mem, stats=stats,
        )
    )
    merged = {k: np.concatenate([c[k] for c in out]) for k in out[0]}
    m_idx, m_nres = M.model_merge_join(r, s, field)
    assert stats.nres == m_nres
    # emitted R rows = the model's surviving R rows, in sorted key order
    got = sorted(
        zip(merged["recid"].tolist(), merged["num"].tolist())
    )
    exp = sorted(
        zip(r["recid"][m_idx].tolist(), r["num"][m_idx].tolist())
    )
    assert got == exp
    keys = M.all_keys(merged, field)
    assert keys == sorted(keys), "output not in global key order"
    # bounded-buffer contract: each device call saw <= mem rows
    assert 0 < stats.peak_range_rows <= mem
    # the per-side dedup counters match EliminateDuplicates
    _, nu_r = M.model_distinct(r, field)
    _, nu_s = M.model_distinct(s, field)
    assert stats.nunique_r == nu_r
    assert stats.nunique_s == nu_s


@pytest.mark.parametrize("field", [0, 1, 3])
def test_external_hash_join_parity(rng, tmp_path, field):
    """Reference HashJoin semantics under a bounded device budget: probe
    multiplicity preserved (semi-join); fields 0-2 collapse the build to
    a key set; field '3' keeps the multimap multiplicity — matched probe
    rows emit once per DUPLICATE build pair (DatabaseProject.cpp:619-628),
    exactly like the in-memory materialize_field3 path."""
    build = M.random_cols(rng, 1800, key_range=300)
    # inject duplicate build rows so field-3 multiplicity > 1 is exercised
    dup = {k: v[:150] for k, v in build.items()}
    build = {k: np.concatenate([v, dup[k]]) for k, v in build.items()}
    probe = M.random_cols(rng, 2600, key_range=300)
    mem = 700
    stats = OperatorStats()
    out = list(
        external_hash_join(
            _chunks_of(build, mem // 2), _chunks_of(probe, mem // 2), field,
            str(tmp_path / "hj"), mem_rows=mem, stats=stats,
        )
    )
    merged = (
        {k: np.concatenate([c[k] for c in out]) for k in out[0]}
        if out else {"recid": np.zeros(0, np.uint32), "num": np.zeros(0, np.uint32)}
    )
    m_matched, m_mult, m_nres = M.model_hash_join(build, probe, field)
    assert stats.nres == m_nres
    if field == 3:
        # multimap expansion: probe row i appears m_mult[i] times
        exp = sorted(
            (int(probe["recid"][i]), int(probe["num"][i]))
            for i in range(len(m_mult))
            for _ in range(m_mult[i])
        )
    else:
        keep = [i for i, m in enumerate(m_matched) if m]
        exp = sorted(
            zip(probe["recid"][keep].tolist(), probe["num"][keep].tolist())
        )
    got = sorted(zip(merged["recid"].tolist(), merged["num"].tolist()))
    assert got == exp
    assert 0 < stats.peak_range_rows <= mem


def test_external_join_member_stream_drained(rng, tmp_path):
    """Emit stream exhausting first must still finalize the member
    stream's sort (per-side stats + spill cleanup — r4 review finding)."""
    r = M.random_cols(rng, 800, key_range=100)
    r["num"] = (r["num"] % 50).astype(np.uint32)  # R keys all <= 49
    s = M.random_cols(rng, 1600, key_range=400)  # S spans far above
    mem = 400
    stats = OperatorStats()
    out = list(
        external_merge_join(
            _chunks_of(r, mem // 2), _chunks_of(s, mem // 2), 1,
            str(tmp_path / "dr"), mem_rows=mem, stats=stats,
        )
    )
    m_idx, m_nres = M.model_merge_join(r, s, 1)
    assert stats.nres == m_nres
    # nunique_s covers the WHOLE S input, not just the chunks pulled
    # before R exhausted
    _, nu_s = M.model_distinct(s, 1)
    assert stats.nunique_s == nu_s
    # the S-side spill dir was cleaned up by the drained generator
    import pathlib

    leftovers = list((pathlib.Path(tmp_path) / "dr" / "s").glob("segment*"))
    assert leftovers == []


def test_external_merge_join_resume(rng, tmp_path):
    """Abandon the join mid-stream; re-running with the same spill dir
    reuses the spilled sort segments (manifest-resumable) and stays exact."""
    r = M.random_cols(rng, 1500, key_range=150)
    s = M.random_cols(rng, 1500, key_range=150)
    mem = 400
    spill = str(tmp_path / "res")

    gen = external_merge_join(
        _chunks_of(r, mem // 2), _chunks_of(s, mem // 2), 1, spill,
        mem_rows=mem,
    )
    next(gen)  # consume one output chunk, then abandon mid-run
    del gen
    store_r = SegmentStore(spill + "/r")
    assert len(store_r.manifest["segments"]) >= 1  # spilled state remains

    stats = OperatorStats()
    out = list(
        external_merge_join(
            _chunks_of(r, mem // 2), _chunks_of(s, mem // 2), 1, spill,
            mem_rows=mem, stats=stats,
        )
    )
    merged = {k: np.concatenate([c[k] for c in out]) for k in out[0]}
    m_idx, m_nres = M.model_merge_join(r, s, 1)
    assert stats.nres == m_nres
    got = sorted(zip(merged["recid"].tolist(), merged["num"].tolist()))
    exp = sorted(zip(r["recid"][m_idx].tolist(), r["num"][m_idx].tolist()))
    assert got == exp


def test_blockfile_writer_streaming(rng, tmp_path):
    """BlockFileWriter: appended chunks of awkward sizes round-trip through
    the reference block format identically to a one-shot write."""
    from database_technology_algorithms_tpu.io.blockfile import (
        BlockFileWriter,
        read_blockfile_numpy,
    )

    cols = M.random_cols(rng, 1234, key_range=99)
    p = str(tmp_path / "stream.bin")
    with BlockFileWriter(p) as w:
        for size in (1, 99, 100, 101, 500, 433):
            start = w.nrows
            w.append({k: v[start : start + size] for k, v in cols.items()})
    back = read_blockfile_numpy(p)
    assert len(back["recid"]) == 1234
    np.testing.assert_array_equal(back["recid"], cols["recid"])
    np.testing.assert_array_equal(back["num"], cols["num"])


def test_external_sort_stale_spill_dir_recomputes(rng, tmp_path):
    """A reused spill dir holding ANOTHER run's segments (different field
    or data) must recompute, never resume stale state (r4: a leftover
    field-1 spill dir fed field-1-sorted segments into a field-3 run)."""
    cols = M.random_cols(rng, 1000, key_range=80)
    spill = str(tmp_path / "stale")

    # run 1: field 1, abandoned mid-run so segments stay on disk
    gen = external_sort(_chunks_of(cols, 256), 1, spill, mem_rows=256)
    next(gen)
    del gen
    assert len(SegmentStore(spill).manifest["segments"]) >= 1

    # run 2: SAME dir, field 2 — must not reuse the field-1 segments
    out = list(external_sort(_chunks_of(cols, 256), 2, spill, mem_rows=256))
    merged = {k: np.concatenate([c[k] for c in out]) for k in out[0]}
    keys = M.all_keys(merged, 2)
    assert keys == sorted(M.all_keys(cols, 2))

    # run 3: same dir again, DIFFERENT data, field 2
    cols2 = M.random_cols(rng, 1000, key_range=80)
    gen = external_sort(_chunks_of(cols, 256), 2, spill, mem_rows=256)
    next(gen)
    del gen  # leave segments for cols
    out = list(external_sort(_chunks_of(cols2, 256), 2, spill, mem_rows=256))
    merged = {k: np.concatenate([c[k] for c in out]) for k in out[0]}
    assert M.all_keys(merged, 2) == sorted(M.all_keys(cols2, 2))


def test_external_hash_join_field3_key_spans_member_chunks(tmp_path):
    """One build key with more duplicates than the budget spans member
    chunks: its multiplicity must still accumulate in full (r4 review,
    reproduced: flushing the emit chunk at boundary-key equality
    undercounted 10x-duplicated keys to cap x)."""
    nb = 11
    build = {
        "recid": np.arange(nb, dtype=np.uint32),
        "num": np.array([5] * 10 + [7], np.uint32),
        "strs": np.zeros((nb, 8), np.uint8),
        "valid": np.ones(nb, bool),
    }
    probe = {
        "recid": np.arange(6, dtype=np.uint32) + 100,
        "num": np.array([5, 5, 5, 7, 7, 9], np.uint32),
        "strs": np.zeros((6, 8), np.uint8),
        "valid": np.ones(6, bool),
    }
    mem = 8  # cap=4: key 5's 10 duplicates span >2 member chunks
    stats = OperatorStats()
    out = list(
        external_hash_join(
            _chunks_of(build, mem // 2), _chunks_of(probe, mem // 2), 3,
            str(tmp_path / "span"), mem_rows=mem, stats=stats,
        )
    )
    m_matched, m_mult, m_nres = M.model_hash_join(build, probe, 3)
    assert m_nres == 32  # 3 probe rows x 10 + 2 x 1
    assert stats.nres == m_nres
    rows = np.concatenate([c["recid"] for c in out])
    exp = sorted(
        int(probe["recid"][i])
        for i in range(6)
        for _ in range(m_mult[i])
    )
    assert sorted(rows.tolist()) == exp


def test_external_join_empty_chunk_guard(rng, tmp_path):
    """A 0-row chunk in either stream must be skipped, not crash the
    key-bounds probe (r4 review, reproduced IndexError)."""
    r = M.random_cols(rng, 300, key_range=40)
    s = M.random_cols(rng, 300, key_range=40)

    def with_empty(cols, size):
        yield {k: v[:0] for k, v in cols.items()}
        yield from _chunks_of(cols, size)

    stats = OperatorStats()
    out = list(
        external_merge_join(
            with_empty(r, 150), with_empty(s, 150), 1,
            str(tmp_path / "empty"), mem_rows=300, stats=stats,
        )
    )
    _, m_nres = M.model_merge_join(r, s, 1)
    assert stats.nres == m_nres


def test_blockfile_chunks_sub_block_budget(rng, tmp_path):
    """A budget below one block's 100 rows yields sub-block chunks that
    honor it (r4 review: --mem-blocks 1 tripped the chunk assert)."""
    cols = generate_columns(5, seed=3)  # 500 rows
    path = str(tmp_path / "small.bin")
    write_blockfile(path, cols)
    chunks = list(blockfile_chunks(path, 30))
    assert all(len(c["recid"]) <= 30 for c in chunks)
    assert sum(len(c["recid"]) for c in chunks) == 500
    out = list(
        external_sort(iter(chunks), 1, str(tmp_path / "sb"), mem_rows=30)
    )
    merged = np.concatenate([c["num"] for c in out])
    np.testing.assert_array_equal(np.sort(cols["num"]), merged)
