"""Debug-mode invariant guards (the engine's sanitizer layer).

The reference has no checks at all — `exit(0)` on bad arguments is its
entire error policy and it happily reads uninitialized buffers
(``/root/reference/DatabaseProject.cpp:177,182``; SURVEY.md §5 sanitizers
row).  The engine's equivalents:

* :func:`check_batch` — host-side structural validation of a RecordBatch
  (shapes, dtypes, NUL-normalized strings, live-count bounds);
* :func:`checked_index` — jit-safe OOB guard via ``checkify`` for the few
  data-dependent index computations (placement destinations, field-3
  expansion sources), enabled by ``EngineConfig.debug_checks``.

SPMD has no shared mutable state, so there is nothing for a TSAN-style
race detector to find; determinism is enforced structurally instead (row
index as final sort key everywhere, order-invariant dedup/emission — see
ops/sort.py) and pinned by the cross-engine equality tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..batch import STR_WIDTH_BUCKETS, RecordBatch


def check_batch(batch: RecordBatch, count=None) -> list[str]:
    """Return a list of invariant violations (empty = healthy). Host-side."""
    problems: list[str] = []
    n = batch.nrows
    if batch.num.shape != (n,):
        problems.append(f"num shape {batch.num.shape} != ({n},)")
    if (
        batch.strw.ndim != 2
        or batch.strw.shape[0] != n
        or batch.strw.shape[1] not in STR_WIDTH_BUCKETS
    ):
        problems.append(
            f"strw shape {batch.strw.shape} != ({n}, K) for K in "
            f"{STR_WIDTH_BUCKETS}"
        )
    if batch.valid.shape != (n,):
        problems.append(f"valid shape {batch.valid.shape} != ({n},)")
    for name, col, want in (
        ("recid", batch.recid, jnp.uint32),
        ("num", batch.num, jnp.uint32),
        ("strw", batch.strw, jnp.uint32),
    ):
        if col.dtype != want:
            problems.append(f"{name} dtype {col.dtype} != {want}")
    if batch.valid.dtype != jnp.bool_:
        problems.append(f"valid dtype {batch.valid.dtype} != bool")
    if count is not None:
        c = int(count)
        if not (0 <= c <= n):
            problems.append(f"live count {c} outside [0, {n}]")
    # NUL-normalization: no nonzero byte may follow the first NUL
    # (strcmp-order equivalence depends on it, batch.py docstring)
    strs = np.asarray(batch.strw).astype(">u4").view(np.uint8).reshape(n, -1)
    seen_nul = np.cumsum(strs == 0, axis=1) > 0
    if np.any(strs[seen_nul] != 0):
        bad = int(np.any(strs * seen_nul != 0, axis=1).sum())
        problems.append(f"{bad} rows have bytes after the first NUL")
    return problems


class MemoryBudgetError(ValueError):
    """An in-memory operator was handed more rows than the device budget."""


def ensure_device_budget(nrows: int, cfg, op: str) -> None:
    """Enforce the nmem_blocks heir on DEVICE operators (trace-time, free).

    The reference's operators run under an explicit bounded-buffer contract
    (``dbtproj.h:48,76``: nmem_blocks simulated-RAM blocks force external
    algorithms).  The engine's device operators are single-pass in HBM, so
    the contract here is a hard gate: an input beyond ``cfg.mem_rows``
    must go through the external (chunked, spilling) drivers
    (external.external_sort / the CLI mergesort/eliminatedup paths), which
    bound every device sort to ``mem_rows`` — silently assuming HBM fits
    is exactly the reference HashJoin's unbounded-memory bug
    (``DatabaseProject.cpp:510-548``), not a capability.
    """
    if nrows > cfg.mem_rows:
        raise MemoryBudgetError(
            f"{op}: {nrows} rows exceed the device budget "
            f"cfg.mem_rows={cfg.mem_rows}; route through the external "
            f"drivers (external.external_sort / external_merge_join / "
            f"external_hash_join) or raise the budget"
        )


def assert_batch(batch: RecordBatch, count=None) -> None:
    problems = check_batch(batch, count)
    if problems:
        raise AssertionError("RecordBatch invariants violated: " + "; ".join(problems))


def checked_take(col: jax.Array, idx: jax.Array, upper: int):
    """jit-safe guarded gather: errors (via checkify) if any index is
    outside [0, upper].  Used under EngineConfig.debug_checks."""
    from jax.experimental import checkify

    checkify.check(
        jnp.all((idx >= 0) & (idx <= upper)),
        "index out of bounds: max {m} > {u}",
        m=jnp.max(idx),
        u=jnp.int32(upper),
    )
    return jnp.take(col, idx, mode="clip")
