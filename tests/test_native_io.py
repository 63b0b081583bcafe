"""Native C++ IO library vs the numpy codec: byte-identical behavior."""

import numpy as np
import pytest

from database_technology_algorithms_tpu.io import native
from database_technology_algorithms_tpu.io.blockfile import (
    read_blockfile_numpy,
    write_blockfile,
)
from database_technology_algorithms_tpu.io.generator import generate_columns

pytestmark = pytest.mark.skipif(
    native.get_lib() is None, reason="native lib unavailable (no g++)"
)


def test_native_read_matches_numpy(tmp_path):
    cols = generate_columns(9, seed=5)
    for k in cols:
        cols[k] = cols[k][:842]  # partial final block
    path = str(tmp_path / "x.bin")
    write_blockfile(path, cols)
    nat = native.read_blockfile_native(path)
    ref = read_blockfile_numpy(path)
    for k in ("recid", "num", "strs"):
        np.testing.assert_array_equal(nat[k], ref[k])
    np.testing.assert_array_equal(nat["valid"], ref["valid"])


def test_native_write_roundtrip(tmp_path):
    cols = generate_columns(4, seed=6)
    path = str(tmp_path / "w.bin")
    nblocks = native.write_blockfile_native(path, cols)
    assert nblocks == 4
    back = read_blockfile_numpy(path)
    for k in ("recid", "num", "strs"):
        np.testing.assert_array_equal(back[k], cols[k])


def test_native_write_matches_numpy_bytes(tmp_path):
    cols = generate_columns(3, seed=7)
    p1, p2 = str(tmp_path / "a.bin"), str(tmp_path / "b.bin")
    write_blockfile(p1, cols)
    native.write_blockfile_native(p2, cols)
    a = open(p1, "rb").read()
    b = open(p2, "rb").read()
    assert a == b


def test_native_generator_consumable_by_oracle(tmp_path):
    import sys

    sys.path.insert(0, str(tmp_path.parent))
    from oracle_harness import run_oracle

    p1, p2 = str(tmp_path / "g1.bin"), str(tmp_path / "g2.bin")
    n = native.generate_pair_native(p1, p2, 10, seed=3, key_range=300)
    assert n == 1000
    stats = run_oracle(str(tmp_path), "mergesort", "g1.bin", "1", 5, "s.bin")
    assert stats["npasses"] >= 2
    sorted_cols = read_blockfile_numpy(str(tmp_path / "s.bin"))
    nums = sorted_cols["num"].astype(np.int64)
    assert len(nums) == 1000
    assert np.all(np.diff(nums) >= 0)
