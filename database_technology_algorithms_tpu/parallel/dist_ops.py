"""Distributed operators: the single-chip kernels composed with the shuffle.

Semantics contract (SURVEY.md §2.3): every distributed operator must return
the same row multisets / counters as its single-chip form.  The composition
is always  *partition → local kernel*:

  distinct / hash-join / aggregate : hash-partition by key (all duplicates of
      a key land on one chip) → unchanged local kernel;
  sort : sample-based range partition (chip k holds global key range k) →
      local total-order sort ⇒ chips concatenated in order are the global
      sorted table.

Tables live as global jax.Arrays with rows sharded over the mesh
(``DistTable``); per-chip live-row counts ride alongside, so capacities stay
static under jit while true sizes flow through the computation.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..batch import RecordBatch
from ..config import DEFAULT_CONFIG, EngineConfig
from ..ops.aggregate import group_aggregate_impl as local_group_aggregate
from ..ops.distinct import distinct_impl as local_distinct
from ..ops.hash_join import hash_join_count_impl as local_hash_join_count
from ..ops.sort import sort_batch_impl as local_sort_batch
from ..ops.filter import compact
from ..ops.keys import key_hash, key_words
from ..ops._jit import resilient_jit
from .mesh import mesh_size
from .shuffle import shuffle


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DistTable:
    """A row-sharded table: global batch + per-chip live-row counts."""

    batch: RecordBatch  # rows sharded over the mesh axis/axes
    count: jax.Array  # int32[ndev], sharded: element d lives on chip d

    @property
    def rows_per_chip(self) -> int:
        return self.batch.nrows // self.count.shape[0]


def _axis(mesh: Mesh):
    names = mesh.axis_names
    return names if len(names) > 1 else names[0]


def distribute(mesh: Mesh, cols: dict, rows_per_chip: int | None = None) -> DistTable:
    """Spread host columns round-robin-free (contiguous blocks) over chips.

    Single-process form; the block-partition pad itself is shared with the
    multi-process path (``multihost.pad_columns`` — r4 review: one pad
    loop, not two)."""
    from .multihost import pad_columns

    ndev = mesh_size(mesh)
    n = len(cols["recid"])
    per = rows_per_chip or -(-n // ndev)
    padded, counts = pad_columns(cols, ndev, per)

    row = NamedSharding(mesh, P(mesh.axis_names))
    batch = RecordBatch(
        recid=jax.device_put(padded["recid"], row),
        num=jax.device_put(padded["num"], row),
        strw=jax.device_put(padded["strw"], row),
        valid=jax.device_put(padded["valid"], row),
    )
    count = jax.device_put(counts, row)
    return DistTable(batch=batch, count=count)


def collect(table: DistTable) -> dict:
    """Gather a DistTable back to compacted host columns (tests/IO)."""
    counts = np.asarray(table.count).reshape(-1)
    per = table.rows_per_chip
    cols = table.batch.to_numpy()
    keep = np.concatenate(
        [np.arange(d * per, d * per + int(counts[d])) for d in range(len(counts))]
    ) if len(counts) else np.zeros(0, np.int64)
    return {k: v[keep] for k, v in cols.items()}


def _shuffle_cap(per_chip_rows: int, ndev: int, cfg: EngineConfig) -> int:
    """Per-destination slot capacity for one chip's sends.

    Keys route whole-key-to-one-destination, so small tables see high
    variance per (src,dst) bucket — keep a generous floor (bounded by the
    chip's own row count: it can never send more than it has).
    """
    cap = max(int(per_chip_rows * cfg.shuffle_slack) // ndev + 1, 64)
    return min(cap, max(per_chip_rows, 1))


def row_bytes(batch: RecordBatch) -> int:
    """Device row footprint at the batch's stored width:
    recid(4) + num(4) + strw(4K) + valid(1)."""
    return 9 + 4 * batch.str_words


def _account_shuffle(stats, mesh: Mesh, rows: int, nbytes_row: int = 137) -> None:
    """Record exchange traffic in the nios-heir counters (metrics.py).

    Model: every live row crosses the chip boundary once per shuffle
    ((ndev-1)/ndev of rows actually leave their chip; we count the full
    all-to-all payload, matching the reference's "count the IO you issued"
    convention, dbtproj.h:52).  A 1-axis mesh rides ICI; with a 'host' axis
    the same bytes also transit DCN.
    """
    if stats is None:
        return
    b = int(rows) * nbytes_row
    stats.bytes_ici += b
    if "host" in mesh.axis_names:
        stats.bytes_dcn += b


def _run_with_overflow_retry(build_and_run, cap: int, cap_limit: int,
                             max_retries: int = 3, stats=None):
    """Call build_and_run(cap); on shuffle overflow, double cap and retry.

    Static capacities keep XLA shapes fixed; a retry therefore recompiles —
    rare (overflow means the slack was undersized for this key skew) and
    always correct: results from an overflowing run are DISCARDED, never
    patched.  cap is clamped to cap_limit (a chip can't send more rows than
    it holds).  Returns the first non-overflowing result.
    The reference has no analogue: its hash table simply grows without
    bound (DatabaseProject.cpp:510-548, SURVEY.md §2 C7).
    """
    # NOTE: scale-based callers (dist_hash_join, the overlapped join) pass
    # cap as a multiplier with cap_limit in rows, so the early break below
    # rarely fires for them — harmless (extra doubling attempts, exact
    # results), and a persisting overflow is always surfaced via the
    # returned ovf, which every caller checks/propagates.
    out, ovf = None, None
    for attempt in range(max_retries + 1):
        out, ovf = build_and_run(min(cap, cap_limit))
        if int(ovf) == 0 or cap >= cap_limit:
            break
        cap *= 2
        if stats is not None:
            stats.retries += 1
    return out, ovf


# ---------------------------------------------------------------------------
# hash-partitioned operators
# ---------------------------------------------------------------------------


def dist_distinct(
    mesh: Mesh, table: DistTable, field, cfg: EngineConfig = DEFAULT_CONFIG,
    stats=None,
) -> tuple[DistTable, jax.Array, jax.Array]:
    """Distributed EliminateDuplicates. Returns (table, nunique, overflow)."""
    ndev = mesh_size(mesh)
    per = table.rows_per_chip
    ax = _axis(mesh)
    row = P(mesh.axis_names)

    def run(cap):
        @functools.partial(
            shard_map,
            mesh=mesh,
            in_specs=(row, row),
            out_specs=(row, row, P()),
            check_vma=False,
        )
        def step(batch, count):
            count = count[0]
            dest = key_hash(batch, field) % jnp.uint32(ndev)
            recv, total, ovf = shuffle(batch, count, dest, ax, ndev, cap, cfg)
            out, n = local_distinct(recv, field, cfg, count=total)
            return out, n[None].astype(jnp.int32), ovf

        out, counts, ovf = resilient_jit(lambda: jax.jit(step))(
            table.batch, table.count
        )
        return (out, counts), ovf

    (out, counts), ovf = _run_with_overflow_retry(
        run, _shuffle_cap(per, ndev, cfg), per, stats=stats
    )
    nunique = jnp.sum(counts)
    if stats is not None:
        stats.rows_in += per * ndev
        stats.nunique = int(nunique)
        _account_shuffle(stats, mesh, per * ndev, row_bytes(table.batch))
    return DistTable(batch=out, count=counts), nunique, ovf


def dist_hash_join(
    mesh: Mesh,
    build: DistTable,
    probe: DistTable,
    field,
    cfg: EngineConfig = DEFAULT_CONFIG,
    stats=None,
) -> tuple[DistTable, jax.Array, jax.Array]:
    """Distributed semi-join (reference HashJoin semantics, fields 0-2 rows;
    field-3 multiplicity folded into nres). Returns (probe_out, nres, ovf)."""
    ndev = mesh_size(mesh)
    per_max = max(build.rows_per_chip, probe.rows_per_chip)
    ax = _axis(mesh)
    row = P(mesh.axis_names)

    def run(cap_scale):
        cap_b = min(
            _shuffle_cap(build.rows_per_chip, ndev, cfg) * cap_scale,
            max(build.rows_per_chip, 1),
        )
        cap_p = min(
            _shuffle_cap(probe.rows_per_chip, ndev, cfg) * cap_scale,
            max(probe.rows_per_chip, 1),
        )

        @functools.partial(
            shard_map,
            mesh=mesh,
            in_specs=(row, row, row, row),
            out_specs=(row, row, P(), P()),
            check_vma=False,
        )
        def step(bb, bc, pb, pc):
            bc, pc = bc[0], pc[0]
            bdest = key_hash(bb, field) % jnp.uint32(ndev)
            pdest = key_hash(pb, field) % jnp.uint32(ndev)
            brecv, btotal, ovf1 = shuffle(bb, bc, bdest, ax, ndev, cap_b, cfg)
            precv, ptotal, ovf2 = shuffle(pb, pc, pdest, ax, ndev, cap_p, cfg)
            matched, mult, _ = local_hash_join_count(
                brecv, precv, field, cfg, build_count=btotal, probe_count=ptotal
            )
            out, nres_rows = compact(precv, matched, cfg)
            nres = jax.lax.psum(jnp.sum(mult), ax)
            return out, nres_rows[None].astype(jnp.int32), nres, ovf1 + ovf2

        out, counts, nres, ovf = resilient_jit(lambda: jax.jit(step))(
            build.batch, build.count, probe.batch, probe.count
        )
        return (out, counts, nres), ovf

    (out, counts, nres), ovf = _run_with_overflow_retry(
        run, 1, per_max, max_retries=6, stats=stats
    )
    if stats is not None:
        stats.rows_in += (build.rows_per_chip + probe.rows_per_chip) * ndev
        stats.nres = int(nres)
        _account_shuffle(
            stats, mesh, build.rows_per_chip * ndev, row_bytes(build.batch)
        )
        _account_shuffle(
            stats, mesh, probe.rows_per_chip * ndev, row_bytes(probe.batch)
        )
    return DistTable(batch=out, count=counts), nres, ovf


def dist_aggregate(
    mesh: Mesh, table: DistTable, field, cfg: EngineConfig = DEFAULT_CONFIG,
    stats=None,
) -> tuple[DistTable, dict, jax.Array]:
    """Distributed group-by aggregate. Returns (reps, aggs, overflow)."""
    ndev = mesh_size(mesh)
    per = table.rows_per_chip
    ax = _axis(mesh)
    row = P(mesh.axis_names)

    def run(cap):
        @functools.partial(
            shard_map,
            mesh=mesh,
            in_specs=(row, row),
            out_specs=(row, row, {"count": row, "sum": row, "min": row, "max": row}, P()),
            check_vma=False,
        )
        def step(batch, count):
            count = count[0]
            dest = key_hash(batch, field) % jnp.uint32(ndev)
            recv, total, ovf = shuffle(batch, count, dest, ax, ndev, cap, cfg)
            reps, aggs, n = local_group_aggregate(recv, field, cfg, count=total)
            return reps, n[None].astype(jnp.int32), aggs, ovf

        reps, counts, aggs, ovf = resilient_jit(lambda: jax.jit(step))(
            table.batch, table.count
        )
        return (reps, counts, aggs), ovf

    (reps, counts, aggs), ovf = _run_with_overflow_retry(
        run, _shuffle_cap(per, ndev, cfg), per, stats=stats
    )
    if stats is not None:
        stats.rows_in += per * ndev
        _account_shuffle(stats, mesh, per * ndev, row_bytes(table.batch))
    return DistTable(batch=reps, count=counts), aggs, ovf


# ---------------------------------------------------------------------------
# range-partitioned sort
# ---------------------------------------------------------------------------


def _lex_ge(words: list[jax.Array], splitters: list[jax.Array]) -> jax.Array:
    """(N, K) bool: key_i >= splitter_k lexicographically."""
    n = words[0].shape[0]
    k = splitters[0].shape[0]
    ge = jnp.ones((n, k), dtype=bool)
    gt = jnp.zeros((n, k), dtype=bool)
    eq = jnp.ones((n, k), dtype=bool)
    for w, s in zip(words, splitters):
        wv = w[:, None]
        sv = s[None, :]
        gt = gt | (eq & (wv > sv))
        eq = eq & (wv == sv)
    return gt | eq


def dist_sort(
    mesh: Mesh,
    table: DistTable,
    field,
    cfg: EngineConfig = DEFAULT_CONFIG,
    sample_per_chip: int = 256,
    stats=None,
) -> tuple[DistTable, jax.Array]:
    """Distributed total-order sort: chip k ends up holding global key-range
    k, locally sorted — concatenating chips in order yields the global sort.

    Splitters come from a per-chip sample all-gathered and reduced
    identically on every chip (deterministic; SURVEY.md §7 hard part #6).
    Partitioning uses the key's leading words (strings: the configured
    prefix), so equal keys colocate; local sorts are exact full-width.
    """
    ndev = mesh_size(mesh)
    per = table.rows_per_chip
    ax = _axis(mesh)
    row = P(mesh.axis_names)
    npart_words = 1 if field in (0, 1, "0", "1") else min(cfg.str_prefix_words, 3) + (
        1 if field in (3, "3") else 0
    )

    def run(cap):
      @functools.partial(
          shard_map,
          mesh=mesh,
          in_specs=(row, row),
          out_specs=(row, row, P()),
          check_vma=False,
      )
      def step(batch, count):
        count = count[0]
        words = key_words(batch, field, nwords=npart_words)[:npart_words]
        n = batch.nrows
        idx = jnp.arange(n, dtype=jnp.int32)
        # sample live rows (strided); dead rows get max-key sentinel so they
        # sort to the top and are sliced off splitter selection
        stride = max(per // sample_per_chip, 1)
        sample_idx = idx[::stride][:sample_per_chip]
        live = sample_idx < count
        sw = [
            jnp.where(live, w[sample_idx], jnp.uint32(0xFFFFFFFF)) for w in words
        ]
        gathered = [
            jax.lax.all_gather(w, ax, tiled=True) for w in sw
        ]  # (ndev*S,) each
        # identical sort on every chip -> identical splitters
        srt = jax.lax.sort(tuple(gathered), num_keys=len(gathered))
        m = gathered[0].shape[0]
        picks = (jnp.arange(1, ndev, dtype=jnp.int32) * m) // ndev
        splitters = [w[picks] for w in srt]  # ndev-1 splitters
        dest = jnp.sum(_lex_ge(words, splitters), axis=1, dtype=jnp.int32)
        recv, total, ovf = shuffle(batch, count, dest, ax, ndev, cap, cfg)
        out, _ = local_sort_batch(recv, field, cfg, count=total)
        return out, total[None].astype(jnp.int32), ovf

      out, counts, ovf = resilient_jit(lambda: jax.jit(step))(
          table.batch, table.count
      )
      return (out, counts), ovf

    (out, counts), ovf = _run_with_overflow_retry(
        run, _shuffle_cap(per, ndev, cfg), per, stats=stats
    )
    if stats is not None:
        stats.rows_in += per * ndev
        _account_shuffle(stats, mesh, per * ndev, row_bytes(table.batch))
    return DistTable(batch=out, count=counts), ovf
