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


@pytest.mark.parametrize("field", [0, 1, 2])
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
