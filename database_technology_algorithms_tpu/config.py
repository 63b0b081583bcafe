"""Engine configuration.

The reference has exactly one runtime knob (``nblocks``, ``main.cpp:23-24``);
everything else is compile-time constants or hardcoded call sites.  Its one
*semantic* knob is the per-operator ``nmem_blocks`` bounded-buffer contract
(``dbtproj.h:48,76``) — the simulated-RAM budget that forces external,
multi-pass algorithms.  Here that becomes explicit per-chip memory budgets.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    # --- memory discipline (the nmem_blocks heir) ---------------------------
    # Rows the engine may hold on-device per operator instance. Inputs larger
    # than this are processed by the external (chunked, spilling) drivers.
    # (The reference's external fan-in knob nmem_blocks-1 has no heir: the
    # two-pass distribution sort has no K-way merge, external.py.)
    mem_rows: int = 16 * 1024 * 1024

    # --- sort ---------------------------------------------------------------
    # u32 words of NUL-normalized string used as the fast-path sort prefix;
    # ties that differ beyond the prefix trigger an exact full-width fallback.
    str_prefix_words: int = 2
    # bit-pack (inactive, u32-key, iota) sorts into 2 operands (r4: measured
    # 1.25x on the view sort, exact — ops/sort.packed_u32_view_sort); False
    # forces the plain 3-operand form (equality testing / other backends)
    packed_u32_sorts: bool = True
    # row-movement engine: "sort" = grouped payload-placement sorts (TPU:
    # beats XLA's ~32 ns/row gather by >10x), "gather" = fused jnp.take
    # (fast on CPU/GPU), "sort2d" = replicated-key 2-D sort (measured 5-8x
    # slower on this TPU, kept for backends with vectorized batched-column
    # sorts — PERF_NOTES.md P1), "auto" = sort on TPU, gather elsewhere
    materialize: str = "auto"

    # --- hash join ----------------------------------------------------------
    # table slots = next_pow2(load_factor_inv * n_build)
    hash_load_factor_inv: int = 2
    # max linear-probe steps before falling back to the sorted path
    hash_max_probe: int = 64
    # engine for single-word (recid/num) join keys:
    #   "generic"      concat-sort + segmented scan (exact for all fields)
    #   "searchsorted" sorted build keys + binary-search probes (fastpath.py)
    #   "table"        open-addressing hash set, gather probes (hash_table.py)
    u32_join_engine: str = "generic"
    # engine for single-word DISTINCT: "generic" | "fastpath"
    u32_distinct_engine: str = "generic"

    # --- distributed --------------------------------------------------------
    # mesh axis names: data axis is the engine's only parallel axis
    mesh_axis: str = "shard"
    # all-to-all per-destination capacity = ceil(rows/ndev) * slack
    shuffle_slack: float = 2.0
    # per-destination rank engine for the shuffle pack: "onehot" (VPU
    # cumsum, O(n*ndev) intermediate — small meshes), "sort" (two small
    # word sorts, O(n log n) — pod scale), "auto" (threshold on ndev)
    shuffle_rank_engine: str = "auto"
    # chunked (overlapped) exchange: >1 splits the pipeline's all_to_all
    # into that many independent slices so XLA overlaps later slices'
    # communication with earlier slices' unpack compute (BASELINE config 5)
    shuffle_nchunks: int = 1
    # engine for the distributed pipeline's HashJoin cross-check over the
    # dedup'd intermediates (main.cpp:121 semantics):
    #   "sorted"  local concat-sort kernel on the colocated sides
    #   "skew"    heavy-hitter replicate/local-probe machinery (skew.py)
    #   "overlap" key-only chunked-exchange machinery (overlap.py; u32
    #             fields — string fields fall back to "sorted")
    # All three are exact for any distribution; the pipeline itself is
    # skew-proof regardless (local-first dedup bounds any key to <=1 row
    # per chip per side before the shuffle).
    dist_join_engine: str = "sorted"
    # heavy-hitter threshold: keys with > rows/(ndev*hh_factor) occurrences
    # get split/broadcast handling
    hh_factor: int = 4
    # number of candidate heavy hitters tracked
    hh_topk: int = 16

    # --- misc ---------------------------------------------------------------
    seed: int = 42
    # enable invariant guards (utils/checks.py): host-side batch validation
    # at ingestion + checkify'd index bounds on data-dependent gathers
    debug_checks: bool = False


DEFAULT_CONFIG = EngineConfig()
