"""Roofline audit: measured rows/s vs HBM-bandwidth speed-of-light.

The reference's only perf instrumentation is the ``nios`` block counter
(``dbtproj.h:52``) — a hand-rolled bytes-moved tracer.  The north star
requires each operator audited against per-chip HBM speed-of-light (≥80%
target for the bandwidth-bound ops).  This module models the minimum bytes
each operator must move through HBM and converts measured wall time into
achieved-bandwidth / fraction-of-roofline.

All engine operators here are bandwidth-bound (integer compares and hashes,
no MXU math), so bytes/s is the honest ceiling; the model counts the
algorithm's *minimum* traffic (one read + one write of live data per logical
pass), not the implementation's actual traffic — so fraction_of_sol < 1 also
exposes algorithmic overhead (e.g. sorting-network passes), which is exactly
what it should do.
"""

from __future__ import annotations

import dataclasses

import jax

# peak HBM bandwidth per chip, GB/s (vendor-published figures)
HBM_GBPS = {
    "TPU v4": 1228.0,
    "TPU v5 lite": 819.0,
    "TPU v5e": 819.0,
    "TPU v5": 2765.0,
    "TPU v5p": 2765.0,
    "TPU v6 lite": 1640.0,
    "TPU v6e": 1640.0,
    "cpu": 50.0,  # nominal, for CI smoke only
}


def chip_hbm_gbps(device=None) -> float:
    device = device or jax.devices()[0]
    kind = getattr(device, "device_kind", "cpu")
    for k, v in HBM_GBPS.items():
        if k.lower() in str(kind).lower():
            return v
    return HBM_GBPS.get(str(device.platform), 100.0)


ROW_BYTES_FULL = 4 + 4 + 128 + 1  # recid + num + strs(padded) + valid
ROW_BYTES_KEY = 8  # key word + row index


@dataclasses.dataclass
class RooflineResult:
    op: str
    rows: int
    wall_s: float
    model_bytes: int
    achieved_gbps: float
    sol_gbps: float
    fraction_of_sol: float
    rows_per_s: float

    def line(self) -> str:
        return (
            f"{self.op:28s} {self.rows:>10,d} rows  {self.wall_s*1e3:8.2f} ms  "
            f"{self.achieved_gbps:7.1f} GB/s  {100*self.fraction_of_sol:5.1f}% of "
            f"{self.sol_gbps:.0f} GB/s SoL  ({self.rows_per_s/1e6:.2f} M rows/s)"
        )


def min_bytes(op: str, rows: int, payload_bytes: int = ROW_BYTES_FULL) -> int:
    """Minimum HBM traffic model per operator (read + write of live data)."""
    if op in ("filter", "compact", "scan"):
        return 2 * rows * payload_bytes
    if op in ("sort", "sort_batch"):
        # true minimum: one read+write of (key, index) to produce the
        # permutation + one read+write of the payload to apply it.  (The
        # round-2 model charged 4 radix passes — an algorithm the engine
        # doesn't run; minimum-traffic models must not inflate the floor.)
        return 2 * rows * ROW_BYTES_KEY + 2 * rows * payload_bytes
    if op in ("distinct",):
        return min_bytes("sort", rows, payload_bytes) + 2 * rows * payload_bytes
    if op in ("hash_join", "hash_join_count"):
        # build read + probe read + output write (probe-sized worst case)
        return 2 * rows * payload_bytes + rows * payload_bytes
    if op in ("merge_join", "join_sorted_distinct"):
        return 3 * rows * payload_bytes
    if op in ("aggregate", "group_aggregate"):
        return min_bytes("sort", rows, payload_bytes)
    if op in ("shuffle", "all_to_all"):
        return 4 * rows * payload_bytes  # pack + exchange + unpack
    if op in ("pipeline",):
        # rows = per-table rows; minimum = read both tables + write the
        # join output (worst case one table's size)
        return 3 * rows * payload_bytes
    return 2 * rows * payload_bytes


def audit(
    op: str,
    rows: int,
    wall_s: float,
    payload_bytes: int = ROW_BYTES_FULL,
    device=None,
) -> RooflineResult:
    sol = chip_hbm_gbps(device)
    mb = min_bytes(op, rows, payload_bytes)
    achieved = mb / wall_s / 1e9 if wall_s > 0 else 0.0
    return RooflineResult(
        op=op,
        rows=rows,
        wall_s=wall_s,
        model_bytes=mb,
        achieved_gbps=achieved,
        sol_gbps=sol,
        fraction_of_sol=achieved / sol if sol else 0.0,
        rows_per_s=rows / wall_s if wall_s else 0.0,
    )


def report(results: list[RooflineResult]) -> str:
    lines = [
        f"roofline vs {results[0].sol_gbps:.0f} GB/s HBM"
        if results
        else "roofline (no results)"
    ]
    lines += [r.line() for r in results]
    return "\n".join(lines)
