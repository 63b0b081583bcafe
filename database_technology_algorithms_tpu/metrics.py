"""Operator statistics and bytes-moved accounting.

The reference's only instrumentation is its stats-out parameters —
``nsorted_segs``, ``npasses``, ``nunique``, ``nres``, ``nios``
(``dbtproj.h:50-52,64-65,78-79,92-93``) — where ``nios`` is a hand-rolled
"blocks moved" tracer with inconsistent units (write-only in MergeSort,
per-multi-block-fread in HashJoin; SURVEY.md §5).  The TPU engine keeps the
same counter *names* so the parity harness can compare 1:1, and replaces the
block-IO unit with **bytes moved per memory tier** (HBM / host / ICI / DCN),
which is what a roofline audit needs.
"""

from __future__ import annotations

import dataclasses
import json
import time
from typing import Optional


@dataclasses.dataclass
class OperatorStats:
    """Per-operator stats; a superset of the reference's out-params."""

    op: str = ""
    rows_in: int = 0
    rows_out: int = 0
    # reference-compatible counters
    nsorted_segs: int = 0
    npasses: int = 0
    nunique: int = 0
    # per-side EliminateDuplicates counters (the external joins run two)
    nunique_r: int = 0
    nunique_s: int = 0
    nres: int = 0
    # bytes-moved per tier (the nios heir)
    bytes_hbm: int = 0
    bytes_host: int = 0
    bytes_ici: int = 0
    bytes_dcn: int = 0
    # out-of-core discipline: largest key-range working set pass 2 ever
    # held in host RAM at once (rows) — must stay O(mem_rows)
    peak_range_rows: int = 0
    # shuffle-overflow recoveries: capacity-doubling re-runs that were needed
    # before the exchange fit (0 = first attempt fit)
    retries: int = 0
    # timing
    wall_s: float = 0.0

    @property
    def rows_per_s(self) -> float:
        return self.rows_in / self.wall_s if self.wall_s else 0.0

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self))

    def merge(self, other: "OperatorStats") -> "OperatorStats":
        out = dataclasses.replace(self)
        for f in (
            "nsorted_segs", "npasses", "bytes_hbm", "bytes_host",
            "bytes_ici", "bytes_dcn",
        ):
            setattr(out, f, getattr(self, f) + getattr(other, f))
        return out


class Timer:
    """Wall-clock span; call .stop() after block_until_ready on outputs."""

    def __init__(self):
        self.t0 = time.perf_counter()
        self.elapsed = 0.0

    def stop(self) -> float:
        self.elapsed = time.perf_counter() - self.t0
        return self.elapsed


def batch_bytes(nrows: int, with_strings: bool = True) -> int:
    """HBM footprint of a RecordBatch of nrows (recid+num+valid+strs)."""
    per_row = 4 + 4 + 1 + (128 if with_strings else 0)
    return nrows * per_row
