"""Hash join (build-side key set, streamed probe; semi-join semantics).

Reference semantics (``DatabaseProject.cpp:504-647``): the build phase
streams file1 into an STL hash map keyed by the join field with a dummy
value, so the build side collapses to a **key set** for fields 0-2
(``:510-540``); the probe phase streams file2 and, on a hit, copies the
**probe-side record** to the output (``:583-629``) — i.e. a semi-join
emitting file2 rows whose key exists in file1, probe multiplicity preserved.
Field '3' uses an ``unordered_multimap`` that keeps *every* build (num,str)
pair (``:543``), so a probe row is emitted once per matching build record —
full inner-join multiplicity (``:619-628``).

Engine forms:
* ``hash_join_count`` / ``hash_join`` (this module): the portable sorted
  implementation — one total-order sort of build∪probe, then run-head
  propagation marks each probe row with its matching build run.  Exact for
  all key widths; jit-safe; O((B+P) log) on the sort network.
* ``hash_table.py``: the bucketed open-addressing path (u32 keys) whose
  probe is a pure gather stream — the high-throughput choice when the build
  side fits a table; the ``hash_join`` dispatcher picks it when eligible.

nres accounting matches the reference exactly: sum of per-probe-row
multiplicities, where multiplicity is 1 for fields 0-2 and the build-side
duplicate count for field 3.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..batch import FIELD_NUMSTR, RecordBatch, canonical_field
from ..config import DEFAULT_CONFIG, EngineConfig
from .filter import compact
from .keys import adjacent_equal, rows_equal_on_field
from .sort import sort_batch_impl, sort_perm_extended


def build_key_multiset(
    build: RecordBatch,
    field,
    cfg: EngineConfig = DEFAULT_CONFIG,
    count: jax.Array | None = None,
) -> tuple[RecordBatch, jax.Array, jax.Array]:
    """Collapse the build side to (unique-key rows, per-key count, n_unique).

    The heir of the reference's hash-table build phase
    (``DatabaseProject.cpp:518-547``) — the map's key set plus, for field 3,
    the multimap's per-key multiplicity.  With `count`, rows past it are
    padding and contribute nothing.
    """
    n = build.nrows
    sorted_b, perm = sort_batch_impl(build, field, cfg, count=count)
    active = (
        jnp.ones(n, dtype=bool)
        if count is None
        else jnp.arange(n, dtype=jnp.int32) < count  # padding sorted to tail
    )
    new_run = active & ~adjacent_equal(sorted_b, field)
    seg = jnp.cumsum(new_run.astype(jnp.int32)) - 1  # run id per row
    counts_per_seg = jnp.zeros(n, dtype=jnp.int32).at[seg].add(
        active.astype(jnp.int32)
    )
    uniq, n_unique = compact(sorted_b, new_run)
    # counts aligned with uniq rows: per-segment count, compacted like the rows
    dest = jnp.where(new_run, seg, n)
    counts = jnp.zeros(n, dtype=jnp.int32).at[dest].set(
        counts_per_seg[seg], mode="drop"
    )
    return uniq, counts, n_unique


def probe_multiplicity(
    build_uniq: RecordBatch,
    build_counts: jax.Array,
    n_build: jax.Array,
    probe: RecordBatch,
    field,
    cfg: EngineConfig = DEFAULT_CONFIG,
    probe_count: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Per-probe-row (matched, build_multiplicity).

    Sort build∪probe by (active, key, side); each equal-key run holds at most
    one build row, first.  A max-scan of run-start positions tells every probe
    row the head of its run; the probe matches iff that head is an active
    build row.
    """
    nb, np_ = build_uniq.nrows, probe.nrows
    both = RecordBatch.concat([build_uniq, probe])
    n = nb + np_
    idx = jnp.arange(n, dtype=jnp.int32)
    side = (idx >= nb).astype(jnp.uint32)  # 0 = build, 1 = probe
    probe_active = (
        jnp.ones(n, dtype=bool) if probe_count is None else (idx - nb) < probe_count
    )
    active = jnp.where(idx < nb, idx < n_build, probe_active)
    inactive_w = (~active).astype(jnp.uint32)

    perm = sort_perm_extended(
        both, field, cfg, pre_words=(inactive_w,), post_words=(side,)
    )
    # run starts in sorted order (key change or first element)
    eq_prev = rows_equal_on_field(both, field, perm[:-1], perm[1:])
    is_start = jnp.concatenate([jnp.ones(1, bool), ~eq_prev])
    pos = jnp.arange(n, dtype=jnp.int32)
    run_start_pos = jax.lax.cummax(jnp.where(is_start, pos, 0))
    head_orig = perm[run_start_pos]  # original index of my run's head row
    head_is_build = (head_orig < nb) & (head_orig < n_build)

    sorted_side_is_probe = (side[perm] == 1) & active[perm]
    matched_sorted = sorted_side_is_probe & head_is_build
    mult_sorted = jnp.where(
        matched_sorted,
        build_counts[jnp.minimum(head_orig, nb - 1)],
        0,
    )
    # map back to probe row space
    probe_orig = perm - nb  # valid where side==1
    matched = jnp.zeros(np_, dtype=bool).at[
        jnp.where(sorted_side_is_probe, probe_orig, np_)
    ].set(matched_sorted, mode="drop")
    mult = jnp.zeros(np_, dtype=jnp.int32).at[
        jnp.where(sorted_side_is_probe, probe_orig, np_)
    ].set(mult_sorted, mode="drop")
    return matched, mult


def hash_join_count_impl(
    build: RecordBatch,
    probe: RecordBatch,
    field,
    cfg: EngineConfig = DEFAULT_CONFIG,
    build_count: jax.Array | None = None,
    probe_count: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Jit-safe core: returns (matched bool[P], mult int32[P], nres).

    nres reproduces the reference counter: fields 0-2 count each matched
    probe row once; field 3 counts build-side duplicates per probe row.
    build_count/probe_count mark live rows under the static-capacity
    convention (padding rows never build nor match).
    """
    field = canonical_field(field)
    from .fastpath import hash_join_count_u32, is_u32_field

    if is_u32_field(field):
        return hash_join_count_u32(
            build, probe, field, build_count=build_count, probe_count=probe_count
        )
    uniq, counts, n_build = build_key_multiset(build, field, cfg, count=build_count)
    matched, mult = probe_multiplicity(
        uniq, counts, n_build, probe, field, cfg, probe_count=probe_count
    )
    if field == FIELD_NUMSTR:
        nres = jnp.sum(mult)
    else:
        mult = matched.astype(jnp.int32)
        nres = jnp.sum(mult)
    return matched, mult, nres


from ._jit import per_static_jit

hash_join_count = per_static_jit(hash_join_count_impl)


def hash_join_impl(
    build: RecordBatch,
    probe: RecordBatch,
    field,
    cfg: EngineConfig = DEFAULT_CONFIG,
) -> tuple[RecordBatch, jax.Array]:
    """Semi-join emitting matched probe rows (fields 0-2), probe order.

    Returns (probe_capacity_batch, nres).  For field 3 the emitted *rows* are
    the matched probe rows (deduplicated against build multiplicity); use
    ``hash_join_count``/``materialize_field3`` when the reference's
    row-repetition output is required.
    """
    matched, _, nres = hash_join_count_impl(build, probe, field, cfg)
    out, _ = compact(probe, matched)
    return out, nres


hash_join = per_static_jit(hash_join_impl)


def materialize_field3(
    probe: RecordBatch, matched: np.ndarray, mult: np.ndarray
) -> RecordBatch:
    """Host-side: repeat each matched probe row `mult` times (field-3 output).

    Output size is data-dependent (sum of multiplicities), so this runs on
    host with np.repeat; the device path reports counts only.
    """
    reps = np.asarray(mult)
    cols = probe.to_numpy()
    return RecordBatch.from_numpy(
        np.repeat(cols["recid"], reps),
        np.repeat(cols["num"], reps),
        np.repeat(cols["strs"], reps, axis=0),
        np.repeat(cols["valid"], reps),
        normalize=False,
    )
