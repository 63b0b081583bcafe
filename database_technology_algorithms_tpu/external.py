"""External (out-of-core) operator drivers: bounded device memory, spill files.

The reference handles datasets ≫ memory with run formation + multi-pass
K-way merge (``DatabaseProject.cpp:172-381``): qsort ``nmem_blocks`` blocks
at a time into ``segment<N>.bin`` files, then repeatedly merge
``nmem_blocks-1`` segments through a priority queue until one remains —
passes = 1 + ceil(log_K(runs)).

The TPU-native replacement is a **two-pass distribution sort** (sample-based
key-range partitioning — the out-of-core analogue of the radix/bucket design
the north star prescribes, and the same algorithm the distributed sort uses
across chips, with disk segments standing in for remote chips):

  pass 1 (run formation): stream ``mem_rows`` chunks → device total-order
    sort → spill each sorted segment + a key sample;
  pass 2 (distribute): choose splitters from the merged sample so each key
    range fits the memory budget; every segment is *sorted*, so each range is
    a contiguous slice (host searchsorted on the spilled key column); gather
    range slices from all segments → device sort → emit, in key order.

Merging k sorted runs per-record through a heap is exactly the scalar hot
loop a vector machine cannot run; distribution sort replaces it with two
bandwidth-bound passes regardless of segment count (vs log_K passes).

Spill segments are the checkpoint/resume unit, like the reference's segment
files (SURVEY.md §5 checkpoint row): a JSON manifest records each spilled
segment (+ an input fingerprint); re-running skips matching segments and
recomputes pass 2 (which is streaming, not materialized).

Stats mirror the reference counters: ``nsorted_segs`` = segments spilled,
``npasses`` = 2 (or 1 if the input fit in memory), bytes spilled/read
accounted per tier in OperatorStats.
"""

from __future__ import annotations

import json
import os
import pathlib
from typing import Callable, Iterator

import numpy as np

from .batch import RecordBatch
from .config import DEFAULT_CONFIG, EngineConfig
from .metrics import OperatorStats, Timer
from .ops.distinct import distinct_sorted
from .ops.filter import truncate
from .ops.keys import key_words
from .ops.sort import sort_batch


def _np_key_words(cols: dict, field) -> np.ndarray:
    """Host-side (nrows, nwords) uint32 key-word matrix (same order as device).

    Width is pinned to the full STR_WORDS so key matrices from different
    segments/chunks (which may store different narrow widths) concatenate
    and compare uniformly.
    """
    from .batch import STR_WORDS

    batch = RecordBatch.from_numpy(
        cols["recid"], cols["num"], cols["strs"], cols.get("valid"),
        normalize=False, str_words=STR_WORDS,
    )
    words = key_words(batch, field, nwords=None)
    return np.stack([np.asarray(w) for w in words], axis=1)


def _searchsorted_rows(sorted_words: np.ndarray, split: np.ndarray, side: str) -> int:
    """Binary search a row `split` in a lexicographically sorted word matrix."""
    lo, hi = 0, len(sorted_words)
    while lo < hi:
        mid = (lo + hi) // 2
        row = sorted_words[mid]
        t = tuple(row)
        s = tuple(split)
        if t < s or (side == "right" and t == s):
            lo = mid + 1
        else:
            hi = mid
    return lo


def _chunk_crc(chunk: dict) -> str:
    """Content fingerprint of one input chunk (cheap host CRC)."""
    import zlib

    h = 0
    for k in ("recid", "num", "strs", "valid"):
        if k in chunk and chunk[k] is not None:
            a = np.ascontiguousarray(np.asarray(chunk[k]))
            h = zlib.crc32(a.tobytes(), h)
    return f"{h:08x}"


class SegmentStore:
    """Spill directory of sorted column segments + manifest (resume unit).

    Each spilled segment records a META fingerprint (sort field + input-
    chunk CRC + row count); resume reuses a segment only when the
    fingerprint matches the chunk being re-streamed — a reused spill dir
    holding another run's segments (different field, different data, or a
    crashed run's leftovers) recomputes instead of silently resuming
    stale state (r4: a leftover field-1 spill dir once fed field-1-sorted
    segments into a field-3 join through the CLI).
    """

    def __init__(self, spill_dir: str):
        self.dir = pathlib.Path(spill_dir)
        self.dir.mkdir(parents=True, exist_ok=True)
        self.manifest_path = self.dir / "manifest.json"
        self.manifest = {"segments": [], "segmeta": {}}
        if self.manifest_path.exists():
            self.manifest = json.loads(self.manifest_path.read_text())
            self.manifest.setdefault("segmeta", {})

    def save_manifest(self):
        tmp = self.manifest_path.with_suffix(".tmp")
        tmp.write_text(json.dumps(self.manifest))
        os.replace(tmp, self.manifest_path)

    COLS = ("recid", "num", "strs", "valid")

    def seg_path(self, i: int, name: str) -> pathlib.Path:
        return self.dir / f"segment{i}.{name}.npy"

    def segment_matches(self, i: int, meta: dict) -> bool:
        return (
            i in self.manifest["segments"]
            and self.manifest["segmeta"].get(str(i)) == meta
            # "keys" included: a segment whose key matrix was lost must
            # recompute, not FileNotFoundError at read time (r4 advice)
            and all(
                self.seg_path(i, c).exists() for c in self.COLS + ("keys",)
            )
        )

    def write_segment(
        self, i: int, cols: dict, keys: np.ndarray, meta: dict | None = None
    ) -> int:
        nbytes = 0
        for name, arr in {**cols, "keys": keys}.items():
            np.save(self.seg_path(i, name), arr)
            nbytes += arr.nbytes
        self.manifest["segmeta"][str(i)] = meta or {}
        if i not in self.manifest["segments"]:
            self.manifest["segments"].append(i)
        self.save_manifest()
        return nbytes

    def open_segment(self, i: int) -> tuple[dict, np.ndarray]:
        """Memory-mapped view of a spilled segment: columns + key matrix.

        Nothing is read from disk until sliced — pass 2 stays out-of-core
        (the bounded-buffer discipline of the reference's nmem_blocks
        contract, DatabaseProject.cpp:245-369)."""
        load = lambda name: np.load(self.seg_path(i, name), mmap_mode="r")
        return {k: load(k) for k in self.COLS}, load("keys")

    def read_segment(self, i: int) -> tuple[dict, np.ndarray]:
        cols, keys = self.open_segment(i)
        return {k: np.array(v) for k, v in cols.items()}, np.array(keys)

    def cleanup(self):
        for f in self.dir.glob("segment*.npy"):
            f.unlink()
        if self.manifest_path.exists():
            self.manifest_path.unlink()


def external_sort(
    chunks: Iterator[dict] | Callable[[], Iterator[dict]],
    field,
    spill_dir: str,
    cfg: EngineConfig = DEFAULT_CONFIG,
    mem_rows: int | None = None,
    stats: OperatorStats | None = None,
    distinct: bool = False,
) -> Iterator[dict]:
    """Sort a host column-chunk stream under a device-memory budget.

    Yields sorted column chunks (each <= mem_rows) in global key order.
    With ``distinct=True``, also eliminates duplicate keys globally (the
    external EliminateDuplicates — valid because pass 2 ranges partition by
    *key*, so all duplicates of a key land in the same device-sorted range).
    """
    stats = stats if stats is not None else OperatorStats(op="external_sort")
    mem_rows = mem_rows or cfg.mem_rows
    store = SegmentStore(spill_dir)
    t = Timer()

    chunk_iter = chunks() if callable(chunks) else chunks

    # ---- pass 1: run formation -------------------------------------------
    nseg = 0
    samples = []
    seg_sizes = []
    total_rows = 0
    sample_every = max(mem_rows // 256, 1)
    for chunk in chunk_iter:
        n = len(chunk["recid"])
        assert n <= mem_rows, "chunk exceeds memory budget"
        total_rows += n
        meta = {"field": str(field), "crc": _chunk_crc(chunk), "nrows": n}
        if store.segment_matches(nseg, meta):
            cols, keys = store.read_segment(nseg)  # resume: already spilled
        else:
            batch = RecordBatch.from_numpy(
                chunk["recid"], chunk["num"], chunk["strs"],
                chunk.get("valid"), normalize=False,
            )
            sorted_b, _ = sort_batch(batch, field, cfg)
            cols = sorted_b.to_numpy()
            keys = _np_key_words(cols, field)
            stats.bytes_hbm += 2 * sum(v.nbytes for v in cols.values())
            stats.bytes_host += store.write_segment(nseg, cols, keys, meta)
        samples.append(keys[::sample_every])
        seg_sizes.append(n)
        nseg += 1

    stats.nsorted_segs = nseg
    stats.rows_in = total_rows

    if nseg == 0:
        stats.npasses = 0
        stats.wall_s = t.stop()
        return
    if nseg == 1:
        # fits in one budgeted chunk: single pass, stream straight out
        cols, _ = store.read_segment(0)
        if distinct:
            cols = _distinct_chunk(cols, field, cfg)
        stats.npasses = 1
        stats.rows_out = len(cols["recid"])
        stats.wall_s = t.stop()
        yield cols
        store.cleanup()
        return

    # ---- pass 2: sample splitters, gather key ranges ----------------------
    sample = np.concatenate(samples, axis=0)
    order = np.lexsort(sample.T[::-1])
    sample = sample[order]
    # enough ranges that a perfectly-balanced range fits in half the budget
    nranges = max(2 * (total_rows // mem_rows + 1), 2)
    step = max(len(sample) // nranges, 1)
    splitters = sample[step::step]

    # memory-mapped segment views: pass 2 reads only each range's slice of
    # each segment from disk (out-of-core; segments are sorted so a key
    # range is one contiguous slice per segment, found by binary search on
    # the memmapped key column — O(log n) rows touched per probe)
    seg_cols = []
    seg_keys = []
    for i in range(nseg):
        cols, keys = store.open_segment(i)
        seg_cols.append(cols)
        seg_keys.append(keys)

    prev_keyvec = None

    def emit(oc):
        """Seam-dedup (for distinct) + account + yield one output chunk."""
        nonlocal prev_keyvec
        if distinct:
            oc = _distinct_chunk(oc, field, cfg)
            if prev_keyvec is not None and len(oc["recid"]):
                first = _np_key_words(
                    {k: v[:1] for k, v in oc.items()}, field
                )[0]
                if tuple(first) == tuple(prev_keyvec):
                    oc = {k: v[1:] for k, v in oc.items()}
        if len(oc["recid"]) == 0:
            return None
        if distinct:
            # the seam-dedup key is only consumed by the next distinct
            # chunk; skip the per-chunk device round trip otherwise
            prev_keyvec = _np_key_words(
                {k: v[-1:] for k, v in oc.items()}, field
            )[0]
        stats.rows_out += len(oc["recid"])
        return oc

    # ranges as per-segment [lo, hi) index windows; a worklist processes them
    # in key order, RE-SPLITTING any range that exceeds the budget by its own
    # spilled keys (splitter-sample misses — e.g. duplicate-heavy samples
    # collapsing adjacent splitters — must not break the nmem_blocks-style
    # bounded-buffer contract, DatabaseProject.cpp:245-369, nor global order:
    # round 2 sorted oversized ranges in independent sub-chunks under a
    # single-hot-key assumption, which emits unsorted output when the range
    # holds many distinct keys).
    def initial_ranges():
        cursors = [0] * nseg
        out = []
        for hi in list(splitters) + [None]:
            slices = []
            for i in range(nseg):
                lo_idx = cursors[i]
                hi_idx = (
                    len(seg_keys[i])
                    if hi is None
                    else _searchsorted_rows(seg_keys[i], hi, "right")
                )
                slices.append((lo_idx, hi_idx))
                cursors[i] = hi_idx
            out.append(slices)
        return out

    stack = list(reversed(initial_ranges()))
    while stack:
        slices = stack.pop()
        total = sum(hi - lo for lo, hi in slices)
        if total == 0:
            continue
        if total <= mem_rows:
            parts = []
            for i, (lo, hi) in enumerate(slices):
                if hi > lo:
                    part = {
                        k: np.array(v[lo:hi]) for k, v in seg_cols[i].items()
                    }
                    stats.bytes_host += sum(v.nbytes for v in part.values())
                    parts.append(part)
            stats.peak_range_rows = max(stats.peak_range_rows, total)
            merged = {k: np.concatenate([p[k] for p in parts]) for k in parts[0]}
            del parts
            batch = RecordBatch.from_numpy(
                merged["recid"], merged["num"], merged["strs"],
                merged.get("valid"), normalize=False,
            )
            sorted_b, _ = sort_batch(batch, field, cfg)
            stats.bytes_hbm += 2 * sum(v.nbytes for v in merged.values())
            oc = emit(sorted_b.to_numpy())
            if oc is not None:
                yield oc
            continue
        # oversized range: all-equal keys cannot be split — but then every
        # row order is key-major order; stream bounded sub-slices directly
        live = [
            (i, lo, hi) for i, (lo, hi) in enumerate(slices) if hi > lo
        ]
        lo_key = min(tuple(seg_keys[i][lo]) for i, lo, _ in live)
        hi_key = max(tuple(seg_keys[i][hi - 1]) for i, _, hi in live)
        if lo_key == hi_key:
            for i, lo, hi in live:
                for s in range(lo, hi, mem_rows):
                    e = min(s + mem_rows, hi)
                    sub = {
                        k: np.array(v[s:e]) for k, v in seg_cols[i].items()
                    }
                    stats.bytes_host += sum(v.nbytes for v in sub.values())
                    stats.peak_range_rows = max(stats.peak_range_rows, e - s)
                    oc = emit(sub)  # equal keys: already key-major order
                    if oc is not None:
                        yield oc
            continue
        # re-split at the range's own median key (sampled from the spilled
        # sorted key columns; memmap reads only)
        samp = []
        for i, lo, hi in live:
            stride = max((hi - lo) // 64, 1)
            samp.append(np.array(seg_keys[i][lo:hi:stride]))
        sample_r = np.concatenate(samp, axis=0)
        order_r = np.lexsort(sample_r.T[::-1])
        med = sample_r[order_r[len(order_r) // 2]]
        side = "right" if tuple(med) == lo_key else "left"
        left, right = [], []
        for i, (lo, hi) in enumerate(slices):
            mid = lo + _searchsorted_rows(seg_keys[i][lo:hi], med, side)
            left.append((lo, mid))
            right.append((mid, hi))
        # both halves are strictly smaller: the range has >1 distinct key, so
        # splitting at (or right of) a present key leaves neither side empty
        stack.append(right)
        stack.append(left)

    stats.npasses = 2
    stats.wall_s = t.stop()
    store.cleanup()


# ---------------------------------------------------------------------------
# external (bounded-memory) joins
# ---------------------------------------------------------------------------


def _chunk_key_bounds(cols: dict, field) -> tuple[tuple, tuple]:
    """(min_key, max_key) of a key-sorted chunk as comparable tuples."""
    first = tuple(_np_key_words({k: v[:1] for k, v in cols.items()}, field)[0])
    last = tuple(_np_key_words({k: v[-1:] for k, v in cols.items()}, field)[0])
    return first, last


def _pad_chunk(cols: dict, cap: int) -> tuple[RecordBatch, int]:
    """Pad host columns to a cap-row device batch (+ live count).

    Fixed capacity keeps the per-pair join executable count small (one per
    (cap, stored-width) signature); the live count marks real rows under
    the engine's static-capacity convention.
    """
    n = len(cols["recid"])
    assert n <= cap, (n, cap)

    def pad(a):
        a = np.asarray(a)
        out = np.zeros((cap,) + a.shape[1:], a.dtype)
        out[:n] = a
        return out

    batch = RecordBatch.from_numpy(
        pad(cols["recid"]), pad(cols["num"]), pad(cols["strs"]),
        pad(cols.get("valid", np.ones(n, bool))), normalize=False,
    )
    return batch, n


def _stream_semi_join(
    emit_chunks: Iterator[dict],
    member_chunks: Iterator[dict],
    field,
    cfg: EngineConfig,
    cap: int,
    stats: OperatorStats,
    field3_mult: bool = False,
) -> Iterator[dict]:
    """Merge-cursor semi-join over two KEY-ORDERED host chunk streams.

    Yields, in the emit stream's (global key) order, the emit-stream rows
    whose key appears in the member stream.  Both streams need only be
    SORTED: boolean membership ORs across member chunks, and build
    multiplicity is ADDITIVE across them (each member row lives in exactly
    one chunk), so per-chunk-pair multiplicities accumulate exactly.  This
    is the bounded-memory heir of the reference's ring-buffer two-pointer
    merge (``DatabaseProject.cpp:406-494``): at most one chunk of each
    stream is resident, and each device call sees <= 2*cap rows.

    ``field3_mult=True`` applies the reference HashJoin's multimap
    semantics (``DatabaseProject.cpp:619-628``) on field '3': ``nres``
    sums build multiplicity and each matched emit row is repeated that
    many times (matching the in-memory ``materialize_field3`` output).

    Advance rule: after testing the current pair, the side whose max key
    is smaller cannot match anything later on the other side — flush (emit
    side) or drop (member side) and pull its next chunk.  The member
    stream is drained at the end either way so its generator finalizes
    (stats totals + spill cleanup).
    """
    from .batch import canonical_field
    from .ops.hash_join import hash_join_count

    fld = canonical_field(field)
    expand = field3_mult and fld == 3

    def next_nonempty(it):
        # a 0-row chunk (e.g. an all-empty-blocks file) has no key bounds
        for c in it:
            if len(c["recid"]):
                return c
        return None

    ea = next_nonempty(emit_chunks)
    mb = next_nonempty(member_chunks)

    # boundary carry: external_sort output chunks never split a key EXCEPT
    # when one key has more duplicates than the budget (the all-equal-key
    # sub-slice path).  A member key spanning retired chunks must still
    # hand its full multiplicity to emit chunks that arrive LATER, so the
    # member stream's current boundary key carries its accumulated count
    # across retirements; a new emit chunk starts with that carry applied
    # (only the boundary key can reappear — every smaller retired key is
    # strictly below the new chunk's min).  r4 review finding, reproduced.
    carry_key: tuple | None = None
    carry_mult = 0

    def fresh_macc(cols):
        m = np.zeros(len(cols["recid"]), np.int64)
        if carry_key is not None and carry_mult:
            kw = _np_key_words(cols, field)
            eq = np.all(kw == np.asarray(carry_key, dtype=kw.dtype), axis=1)
            m[eq] += carry_mult
        return m

    macc = None if ea is None else fresh_macc(ea)

    def flush(cols, m):
        matched = m > 0
        if expand:
            stats.nres += int(m.sum())
        else:
            stats.nres += int(matched.sum())
        if not matched.any():
            return None
        out = {k: np.asarray(v)[matched] for k, v in cols.items()}
        if expand:
            reps = m[matched]
            out = {k: np.repeat(v, reps, axis=0) for k, v in out.items()}
        stats.rows_out += len(out["recid"])
        return out

    def retire_member(cols):
        nonlocal carry_key, carry_mult
        kw = _np_key_words(cols, field)
        kb = tuple(kw[-1])
        cnt = int(np.all(kw == np.asarray(kb, dtype=kw.dtype), axis=1).sum())
        if carry_key == kb:
            carry_mult += cnt
        else:
            carry_key, carry_mult = kb, cnt

    while ea is not None:
        n_e = len(ea["recid"])
        if mb is None:
            # member stream exhausted: nothing further can match
            out = flush(ea, macc)
            if out is not None:
                yield out
            ea = next_nonempty(emit_chunks)
            macc = None if ea is None else fresh_macc(ea)
            continue
        e_min, e_max = _chunk_key_bounds(ea, field)
        m_min, m_max = _chunk_key_bounds(mb, field)
        if e_max < m_min or m_max < e_min:
            # disjoint key ranges: skip the device call entirely
            pass
        else:
            eb_dev, en = _pad_chunk(ea, cap)
            mb_dev, mn = _pad_chunk(mb, cap)
            stats.peak_range_rows = max(stats.peak_range_rows, en + mn)
            stats.bytes_hbm += sum(
                int(np.asarray(v).nbytes) for v in (*ea.values(), *mb.values())
            )
            _, mult, _ = hash_join_count(
                mb_dev, eb_dev, field, cfg,
                build_count=mn, probe_count=en,
            )
            macc += np.asarray(mult)[:n_e]
        # advance rule: flush the emit chunk only once the member stream
        # has moved STRICTLY past it — at e_max == m_max the boundary
        # key's duplicates may continue in the next member chunk (r4
        # review: flushing at equality undercounted field-3 multiplicity
        # whenever one build key spans member chunks)
        if e_max < m_max:
            out = flush(ea, macc)
            if out is not None:
                yield out
            ea = next_nonempty(emit_chunks)
            macc = None if ea is None else fresh_macc(ea)
        else:
            retire_member(mb)
            mb = next_nonempty(member_chunks)
    # drain the member stream: its generator's trailing code (stats
    # accumulation, npasses, spill cleanup) must run even when the emit
    # stream exhausted first (r4 review finding)
    for _ in member_chunks:
        pass


def external_merge_join(
    r_chunks: Iterator[dict] | Callable[[], Iterator[dict]],
    s_chunks: Iterator[dict] | Callable[[], Iterator[dict]],
    field,
    spill_dir: str,
    cfg: EngineConfig = DEFAULT_CONFIG,
    mem_rows: int | None = None,
    stats: OperatorStats | None = None,
) -> Iterator[dict]:
    """External MergeJoin: bounded-memory sort→distinct→intersect pipeline.

    The reference MergeJoin is external end-to-end: EliminateDuplicates on
    both inputs, then a two-pointer merge over the two sorted-distinct
    FILES through an nmem_blocks-bounded buffer ring, emitting the R-side
    record of each matched key (``DatabaseProject.cpp:384-502``; contract
    ``dbtproj.h:70-76``).  Here both inputs run through
    ``external_sort(distinct=True)`` (spill segments + manifest, resumable)
    and the two key-ordered streams meet in a chunk-pair merge cursor
    (:func:`_stream_semi_join`): each side holds one <= mem_rows/2 chunk,
    so device residency never exceeds ``mem_rows`` rows regardless of
    input size.

    Yields matched R rows in global key order.  Stats: ``nres`` pairs,
    ``nunique_r``/``nunique_s`` (the EliminateDuplicates counters),
    ``peak_range_rows`` <= mem_rows.
    """
    stats = stats if stats is not None else OperatorStats(op="external_merge_join")
    mem_rows = mem_rows or cfg.mem_rows
    cap = max(mem_rows // 2, 1)
    st_r = OperatorStats(op="external_sort_r")
    st_s = OperatorStats(op="external_sort_s")
    r_sorted = external_sort(
        r_chunks, field, os.path.join(spill_dir, "r"), cfg,
        mem_rows=cap, stats=st_r, distinct=True,
    )
    s_sorted = external_sort(
        s_chunks, field, os.path.join(spill_dir, "s"), cfg,
        mem_rows=cap, stats=st_s, distinct=True,
    )
    t = Timer()
    yield from _stream_semi_join(r_sorted, s_sorted, field, cfg, cap, stats)
    stats.nunique = st_r.rows_out
    stats.nunique_r = st_r.rows_out
    stats.nunique_s = st_s.rows_out
    stats.nsorted_segs = st_r.nsorted_segs + st_s.nsorted_segs
    stats.npasses = max(st_r.npasses, st_s.npasses) + 1
    stats.rows_in = st_r.rows_in + st_s.rows_in
    stats.bytes_host += st_r.bytes_host + st_s.bytes_host
    stats.wall_s = t.stop()


def external_hash_join(
    build_chunks: Iterator[dict] | Callable[[], Iterator[dict]],
    probe_chunks: Iterator[dict] | Callable[[], Iterator[dict]],
    field,
    spill_dir: str,
    cfg: EngineConfig = DEFAULT_CONFIG,
    mem_rows: int | None = None,
    stats: OperatorStats | None = None,
) -> Iterator[dict]:
    """External HashJoin: bounded-memory semi-join emitting probe rows.

    The reference HashJoin ignores its nmem_blocks contract — the build
    table grows without bound (``DatabaseProject.cpp:510-548``; SURVEY §2
    C7) — so the external form is a capability the reference claims but
    does not have.  Reference semantics are preserved field-for-field:
    fields 0-2 collapse the build side to a key SET (so it streams as
    ``external_sort(distinct=True)``); field '3' keeps the multimap
    multiplicity (``DatabaseProject.cpp:619-628``) — the build stream
    stays merely SORTED and per-chunk multiplicities accumulate
    additively, with each matched probe row emitted once per matching
    build record, exactly like the in-memory ``materialize_field3`` path.
    The probe side is sorted (multiplicity preserved) and matched probe
    rows stream out in probe-key order.  Same bounded residency as
    :func:`external_merge_join`: one chunk per stream, <= mem_rows rows on
    device per membership call.
    """
    from .batch import canonical_field

    fld = canonical_field(field)
    stats = stats if stats is not None else OperatorStats(op="external_hash_join")
    mem_rows = mem_rows or cfg.mem_rows
    cap = max(mem_rows // 2, 1)
    st_b = OperatorStats(op="external_sort_build")
    st_p = OperatorStats(op="external_sort_probe")
    b_sorted = external_sort(
        build_chunks, field, os.path.join(spill_dir, "b"), cfg,
        mem_rows=cap, stats=st_b, distinct=(fld != 3),
    )
    p_sorted = external_sort(
        probe_chunks, field, os.path.join(spill_dir, "p"), cfg,
        mem_rows=cap, stats=st_p, distinct=False,
    )
    t = Timer()
    yield from _stream_semi_join(
        p_sorted, b_sorted, field, cfg, cap, stats, field3_mult=True
    )
    stats.nsorted_segs = st_b.nsorted_segs + st_p.nsorted_segs
    stats.npasses = max(st_b.npasses, st_p.npasses) + 1
    stats.rows_in = st_b.rows_in + st_p.rows_in
    stats.bytes_host += st_b.bytes_host + st_p.bytes_host
    stats.wall_s = t.stop()


def _distinct_chunk(cols: dict, field, cfg: EngineConfig) -> dict:
    batch = RecordBatch.from_numpy(
        cols["recid"], cols["num"], cols["strs"], cols.get("valid"),
        normalize=False,
    )
    out, n = distinct_sorted(batch, field)
    return truncate(out, int(n)).to_numpy()


def blockfile_chunks(path: str, mem_rows: int) -> Iterator[dict]:
    """Stream a reference block file as host column chunks of <= mem_rows."""
    from .io.blockfile import (
        BLOCK_SIZE,
        MAX_RECORDS_PER_BLOCK,
        decode_blocks_span,
    )

    # read in block-aligned spans without loading the whole file
    raw = np.memmap(path, dtype=np.uint8, mode="r")
    nblocks = len(raw) // BLOCK_SIZE
    blocks_per_chunk = max(mem_rows // MAX_RECORDS_PER_BLOCK, 1)
    for b0 in range(0, nblocks, blocks_per_chunk):
        b1 = min(b0 + blocks_per_chunk, nblocks)
        chunk = decode_blocks_span(
            np.array(raw[b0 * BLOCK_SIZE : b1 * BLOCK_SIZE])
        )
        total = len(chunk["recid"])
        # a budget below one block's row count must still be honored:
        # slice the decoded span to <= mem_rows rows per yielded chunk
        # (r4 review: `--mem-blocks 1` halves to a 50-row budget, which
        # tripped external_sort's chunk assert on 100-row blocks)
        for s in range(0, total, mem_rows):
            yield {k: v[s : s + mem_rows] for k, v in chunk.items()}
