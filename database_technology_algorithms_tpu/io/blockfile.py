"""Reader/writer for the reference engine's binary block file format.

Layout (verified against the reference structs by compilation —
``/root/reference/dbtproj.h:20-38``, x86-64 alignment):

    record_t (140 B): recid u32 | num u32 | str char[120] | valid u8 |
                      pad[3] | dummy1 u32 | dummy2 u32
    block_t (14016 B): blockid u32 | nreserved u32 | entries record_t[100] |
                       valid u8 | misc u8 | pad[2] | dummy u32

These codecs exist so every stage of the TPU engine can be diffed against the
reference binary (the parity oracle) on identical byte inputs.  The hot path —
AoS bytes -> SoA columns — is a pure numpy strided view + copy per column,
with an optional native C path (see ``native/``) for large files.
"""

from __future__ import annotations

import numpy as np

from ..batch import (
    MAX_RECORDS_PER_BLOCK,
    STR_LENGTH,
    STR_PAD,
    RecordBatch,
    normalize_str_bytes,
)

RECORD_SIZE = 140
BLOCK_SIZE = 14016

RECORD_DTYPE = np.dtype(
    {
        "names": ["recid", "num", "str", "valid", "dummy1", "dummy2"],
        "formats": ["<u4", "<u4", f"({STR_LENGTH},)u1", "u1", "<u4", "<u4"],
        "offsets": [0, 4, 8, 128, 132, 136],
        "itemsize": RECORD_SIZE,
    }
)

BLOCK_DTYPE = np.dtype(
    {
        "names": ["blockid", "nreserved", "entries", "valid", "misc", "dummy"],
        "formats": ["<u4", "<u4", (RECORD_DTYPE, (MAX_RECORDS_PER_BLOCK,)), "u1", "u1", "<u4"],
        "offsets": [0, 4, 8, 14008, 14009, 14012],
        "itemsize": BLOCK_SIZE,
    }
)

assert RECORD_DTYPE.itemsize == RECORD_SIZE
assert BLOCK_DTYPE.itemsize == BLOCK_SIZE


def decode_blocks_span(raw: np.ndarray) -> dict:
    """Decode a contiguous byte span of whole blocks into SoA columns.

    Honors each block's ``nreserved`` header (partial blocks appear in
    reference outputs; some reference writers lie in the FINAL block's
    header — SURVEY.md §2 C6/C7 — so oracle-output diffs pair this with a
    trusted row count).  The single decode path shared by the whole-file
    reader and the streaming chunker (r4 review: a format fix must land
    once).
    """
    nblocks = len(raw) // BLOCK_SIZE
    blocks = np.ascontiguousarray(raw[: nblocks * BLOCK_SIZE]).view(BLOCK_DTYPE)
    nres = np.minimum(blocks["nreserved"], MAX_RECORDS_PER_BLOCK).astype(np.int64)
    total = int(nres.sum())

    entries = blocks["entries"]  # (nblocks, 100) structured
    # mask of real rows per block
    row_idx = np.arange(MAX_RECORDS_PER_BLOCK)[None, :]
    mask = row_idx < nres[:, None]

    recid = entries["recid"][mask].astype(np.uint32)
    num = entries["num"][mask].astype(np.uint32)
    strs120 = entries["str"][mask]  # (total, 120) uint8
    valid = entries["valid"][mask].astype(bool)

    strs = np.zeros((total, STR_PAD), dtype=np.uint8)
    strs[:, :STR_LENGTH] = strs120
    strs = normalize_str_bytes(strs)
    return {"recid": recid, "num": num, "strs": strs, "valid": valid}


def read_blockfile_numpy(path: str) -> dict:
    """Parse a block file into host SoA numpy columns (see
    :func:`decode_blocks_span` for the header-honoring semantics)."""
    return decode_blocks_span(np.fromfile(path, dtype=np.uint8))


def read_blockfile(path: str, prefer_native: bool = True) -> RecordBatch:
    cols = None
    if prefer_native:
        from .native import read_blockfile_native

        cols = read_blockfile_native(path)
    if cols is None:
        cols = read_blockfile_numpy(path)
    return RecordBatch.from_numpy(
        cols["recid"], cols["num"], cols["strs"], cols["valid"], normalize=False
    )


def _encode_blocks(cols: dict, start_blockid: int, full_header: bool) -> np.ndarray:
    """Encode SoA columns as an array of reference-format blocks."""
    recid = np.asarray(cols["recid"], dtype=np.uint32)
    num = np.asarray(cols["num"], dtype=np.uint32)
    strs = np.asarray(cols["strs"], dtype=np.uint8)
    valid = np.asarray(cols.get("valid", np.ones(len(recid), bool)))
    n = len(recid)
    nblocks = -(-n // MAX_RECORDS_PER_BLOCK) if n else 0

    blocks = np.zeros(nblocks, dtype=BLOCK_DTYPE)
    pad_n = nblocks * MAX_RECORDS_PER_BLOCK

    def padcol(a, shape_tail=()):
        out = np.zeros((pad_n,) + shape_tail, dtype=a.dtype)
        out[:n] = a
        return out.reshape((nblocks, MAX_RECORDS_PER_BLOCK) + shape_tail)

    if nblocks:
        entries = blocks["entries"]
        entries["recid"] = padcol(recid)
        entries["num"] = padcol(num)
        entries["str"] = padcol(strs[:, :STR_LENGTH], (STR_LENGTH,))
        entries["valid"] = padcol(valid.astype(np.uint8))
        blocks["blockid"] = np.arange(
            start_blockid, start_blockid + nblocks, dtype=np.uint32
        )
        counts = np.full(nblocks, MAX_RECORDS_PER_BLOCK, dtype=np.uint32)
        if n % MAX_RECORDS_PER_BLOCK and full_header:
            counts[-1] = n % MAX_RECORDS_PER_BLOCK
        blocks["nreserved"] = counts
        # The reference merge phase treats block.dummy as its per-block
        # unconsumed-record counter and requires dummy == nreserved on input
        # (generator sets it at main.cpp:70; consumed at
        # DatabaseProject.cpp:282,295,317-321 — dummy=0 underflows and the
        # merge loop never terminates).
        blocks["dummy"] = counts
        blocks["valid"] = 1
    return blocks


def write_blockfile(path: str, batch_or_cols, full_header: bool = True) -> int:
    """Write SoA columns back out as reference-format blocks.

    Returns the number of blocks written.  ``full_header=True`` writes honest
    ``nreserved`` for the final partial block (unlike reference MergeJoin,
    which claims MAX_RECORDS_PER_BLOCK even for partial tails,
    ``DatabaseProject.cpp:439,489``).
    """
    if isinstance(batch_or_cols, RecordBatch):
        cols = batch_or_cols.to_numpy()
    else:
        cols = batch_or_cols
    blocks = _encode_blocks(cols, 0, full_header)
    blocks.tofile(path)
    return len(blocks)


class BlockFileWriter:
    """Streaming block-file writer: append column chunks, bounded memory.

    The external drivers' output sink — holds at most one partial block
    between appends (the reference ring-buffer's single buffered output
    block, ``DatabaseProject.cpp:433-443``), so a join/sort result larger
    than RAM streams straight to disk.
    """

    def __init__(self, path: str, full_header: bool = True):
        self.f = open(path, "wb")
        self.full_header = full_header
        self.blockid = 0
        self.nrows = 0
        self._tail: dict | None = None  # pending partial-block rows

    def append(self, cols: dict) -> None:
        n = len(cols["recid"])
        if n == 0:
            return
        self.nrows += n
        if self._tail is not None:
            cols = {
                k: np.concatenate([self._tail[k], np.asarray(cols[k])])
                for k in self._tail
            }
            self._tail = None
        total = len(cols["recid"])
        full = (total // MAX_RECORDS_PER_BLOCK) * MAX_RECORDS_PER_BLOCK
        if full:
            head = {k: np.asarray(v)[:full] for k, v in cols.items()}
            blocks = _encode_blocks(head, self.blockid, self.full_header)
            blocks.tofile(self.f)
            self.blockid += len(blocks)
        if total > full:
            self._tail = {k: np.asarray(v)[full:] for k, v in cols.items()}

    def close(self) -> int:
        """Flush the final partial block; returns total blocks written."""
        if self._tail is not None:
            blocks = _encode_blocks(self._tail, self.blockid, self.full_header)
            blocks.tofile(self.f)
            self.blockid += len(blocks)
            self._tail = None
        self.f.close()
        return self.blockid

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
