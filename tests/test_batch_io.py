"""RecordBatch substrate + block-file codec tests."""

import numpy as np

from database_technology_algorithms_tpu.batch import (
    STR_PAD,
    RecordBatch,
    normalize_str_bytes,
)
from database_technology_algorithms_tpu.io.blockfile import (
    BLOCK_DTYPE,
    BLOCK_SIZE,
    RECORD_DTYPE,
    RECORD_SIZE,
    read_blockfile,
    read_blockfile_numpy,
    write_blockfile,
)
from database_technology_algorithms_tpu.io.generator import (
    generate_columns,
    generate_pair_files,
)


def test_struct_sizes_match_reference():
    # sizeof(record_t)=140, sizeof(block_t)=14016 (SURVEY.md §2 C1)
    assert RECORD_DTYPE.itemsize == RECORD_SIZE == 140
    assert BLOCK_DTYPE.itemsize == BLOCK_SIZE == 14016


def test_normalize_str_bytes():
    s = np.zeros((2, 8), dtype=np.uint8)
    s[0] = [65, 66, 0, 99, 99, 99, 99, 99]  # "AB\0garbage"
    s[1] = [65] * 8  # no NUL
    out = normalize_str_bytes(s)
    assert list(out[0]) == [65, 66, 0, 0, 0, 0, 0, 0]
    assert list(out[1]) == [65] * 8


def test_blockfile_roundtrip(tmp_path):
    cols = generate_columns(nblocks=7, seed=3)
    # chop to a non-block-multiple row count to test partial final block
    for k in cols:
        cols[k] = cols[k][:642]
    path = str(tmp_path / "t.bin")
    nblocks = write_blockfile(path, cols)
    assert nblocks == 7
    back = read_blockfile_numpy(path)
    assert len(back["recid"]) == 642
    np.testing.assert_array_equal(back["recid"], cols["recid"])
    np.testing.assert_array_equal(back["num"], cols["num"])
    np.testing.assert_array_equal(back["strs"], cols["strs"])
    assert back["valid"].all()


def test_generator_plants_hola(tmp_path):
    cols = generate_columns(nblocks=3, seed=9)
    # row 1 of each block is "Hola" (main.cpp:57-61)
    for b in range(3):
        row = cols["strs"][b * 100 + 1]
        assert row[:5].tobytes() == b"Hola\x00"
    assert cols["num"].max() < 3 * 30


def test_generate_pair_files(tmp_path):
    p1, p2 = str(tmp_path / "f1.bin"), str(tmp_path / "f2.bin")
    generate_pair_files(p1, p2, nblocks=2, seed=5)
    b1, b2 = read_blockfile(p1), read_blockfile(p2)
    assert b1.nrows == b2.nrows == 200
    np.testing.assert_array_equal(np.asarray(b1.recid), np.asarray(b2.recid))
    # different payloads
    assert not np.array_equal(np.asarray(b1.num), np.asarray(b2.num))


def test_batch_take_and_concat():
    cols = generate_columns(nblocks=1, seed=0)
    b = RecordBatch.from_numpy(cols["recid"], cols["num"], cols["strs"])
    idx = np.array([5, 0, 99], dtype=np.int32)
    t = b.take(idx)
    assert t.nrows == 3
    assert int(t.recid[0]) == 5 and int(t.recid[2]) == 99
    c = RecordBatch.concat([b, t])
    assert c.nrows == 103
    # narrow-width storage: 5-char strings live in the smallest bucket,
    # and the host view is always the full logical 128 bytes
    from database_technology_algorithms_tpu.batch import STR_WIDTH_BUCKETS

    assert c.strw.shape[1] in STR_WIDTH_BUCKETS
    assert c.strw.shape == (103, 2)
    assert c.to_numpy()["strs"].shape == (103, STR_PAD)


def test_narrow_width_mixed_concat_and_pad():
    # batches of different static widths interoperate: concat pads, and the
    # logical byte view is identical to full-width storage
    from database_technology_algorithms_tpu.batch import STR_WORDS

    cols = generate_columns(nblocks=1, seed=1)
    narrow = RecordBatch.from_numpy(cols["recid"], cols["num"], cols["strs"])
    wide = RecordBatch.from_numpy(
        cols["recid"], cols["num"], cols["strs"], str_words=STR_WORDS
    )
    assert narrow.str_words == 2 and wide.str_words == STR_WORDS
    both = RecordBatch.concat([narrow, wide])
    assert both.str_words == STR_WORDS
    nv, wv = narrow.to_numpy()["strs"], wide.to_numpy()["strs"]
    np.testing.assert_array_equal(nv, wv)
    np.testing.assert_array_equal(both.to_numpy()["strs"][: len(nv)], nv)
    # long strings pick a covering bucket and round-trip exactly
    longs = np.zeros((4, 128), np.uint8)
    longs[:, :50] = np.arange(1, 51, dtype=np.uint8)[None, :]
    lb = RecordBatch.from_numpy(
        np.arange(4, dtype=np.uint32), np.arange(4, dtype=np.uint32), longs
    )
    assert lb.str_words == 16
    np.testing.assert_array_equal(lb.to_numpy()["strs"][:, :128], longs)
