"""Exchange/compute-overlapped distributed hash join (parallel/overlap.py).

The overlapped engine must be multiset-identical to the barrier engine on
the same 8-device mesh (SURVEY.md §2.3 — whole-table results independent of
the communication schedule), including partial-match, no-match, and skewed
inputs, for any chunk count.
"""

import numpy as np
import pytest

import model as M

from database_technology_algorithms_tpu.config import EngineConfig
from database_technology_algorithms_tpu.parallel import (
    collect,
    dist_hash_join,
    distribute,
    make_mesh,
)
from database_technology_algorithms_tpu.parallel.overlap import (
    dist_hash_join_overlapped,
)

CFG = EngineConfig(shuffle_slack=2.0)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh()


def _rows(cols):
    return sorted(
        zip(cols["recid"].tolist(), cols["num"].tolist(),
            (bytes(s) for s in cols["strs"]))
    )


@pytest.mark.parametrize("field", [0, 1])
@pytest.mark.parametrize("nchunks", [1, 3, 4])
def test_overlapped_matches_barrier(rng, mesh, field, nchunks):
    build = M.random_cols(rng, 700, key_range=4000)
    probe = M.random_cols(rng, 900, key_range=4000)
    tb, tp = distribute(mesh, build), distribute(mesh, probe)
    o1, n1, _ = dist_hash_join(mesh, tb, tp, field, CFG)
    o2, n2, v2 = dist_hash_join_overlapped(
        mesh, tb, tp, field, CFG, nchunks=nchunks
    )
    assert int(v2) == 0
    m = M.model_hash_join(build, probe, field)[2]
    assert int(n1) == int(n2) == m
    assert _rows(collect(o1)) == _rows(collect(o2))


def test_overlapped_no_matches(rng, mesh):
    build = M.random_cols(rng, 40, key_range=10**8)
    probe = M.random_cols(rng, 80, key_range=10**8)
    tb, tp = distribute(mesh, build), distribute(mesh, probe)
    out, nres, ovf = dist_hash_join_overlapped(mesh, tb, tp, 1, CFG)
    assert int(ovf) == 0
    assert int(nres) == M.model_hash_join(build, probe, 1)[2]


def test_overlapped_skewed_recovers(rng, mesh):
    """A hot probe key overflows the 1.5-slack key slots; the overflow
    retry (capacity doubling) recovers and stays exact."""
    from database_technology_algorithms_tpu.metrics import OperatorStats

    n = 4000
    build = M.random_cols(rng, 400, key_range=50)
    probe = M.random_cols(rng, n, key_range=50)
    hot = rng.random(n) < 0.5
    probe["num"] = np.where(hot, 7, probe["num"]).astype(np.uint32)
    cfg = EngineConfig(shuffle_slack=1.5)
    tb, tp = distribute(mesh, build), distribute(mesh, probe)
    st = OperatorStats()
    out, nres, ovf = dist_hash_join_overlapped(mesh, tb, tp, 1, cfg, stats=st)
    assert int(ovf) == 0 and st.retries > 0
    assert int(nres) == M.model_hash_join(build, probe, 1)[2]
    # key-only traffic accounting is populated
    assert st.bytes_ici > 0


@pytest.mark.parametrize("field", [2, 3])
def test_overlapped_join_short_string_fields(rng, mesh, field):
    """r3: narrow-width storage makes short string keys exchangeable
    exactly — field '2'/'3' keys at 2 stored words cross the wire as word
    planes with zero verify passes; results must equal the barrier join."""
    pool = [b"", b"a", b"ab", b"Hola", b"hola", b"zzz", b"abcdefg"]
    cols_b = M.random_cols(rng, 600, key_range=50, str_pool=pool)
    cols_p = M.random_cols(rng, 700, key_range=50, str_pool=pool)
    tb, tp = distribute(mesh, cols_b), distribute(mesh, cols_p)
    assert tb.batch.str_words == 2  # short strings -> narrow bucket
    out_o, nres_o, ovf_o = dist_hash_join_overlapped(mesh, tb, tp, field, CFG)
    assert int(ovf_o) == 0
    out_b, nres_b, ovf_b = dist_hash_join(mesh, tb, tp, field, CFG)
    assert int(ovf_b) == 0
    assert int(nres_o) == int(nres_b), field
    ko = sorted(M.all_keys(collect(out_o), field))
    kb = sorted(M.all_keys(collect(out_b), field))
    assert ko == kb
