"""Deterministic synthetic-data generator, shape-compatible with the reference.

Mirrors the *distributional shape* of the reference generator
(``/root/reference/main.cpp:41-77``): sequential ``recid``; ``num`` uniform in
``[0, nblocks*30)`` (≈3.3% of rows share a key with some other row); ``str`` a
random 5-char lowercase string; the literal string ``"Hola"`` planted at row 1
of every block on *both* files so string-field joins are guaranteed matches.

Unlike the reference (seeded from ``time(0)``, ``main.cpp:22``) this generator
is seeded explicitly, so every test/benchmark is reproducible.  It also adds a
Zipf mode for the skew configs in BASELINE.json (config 4), which the
reference has no equivalent for.
"""

from __future__ import annotations

import numpy as np

from ..batch import MAX_RECORDS_PER_BLOCK, STR_PAD, RecordBatch

_LOWER = np.frombuffer(b"abcdefghijklmnopqrstuvwxyz", dtype=np.uint8)
_HOLA = np.frombuffer(b"Hola", dtype=np.uint8)


def generate_columns(
    nblocks: int,
    seed: int = 42,
    key_range: int | None = None,
    recid_start: int = 0,
    plant_hola: bool = True,
    zipf_a: float | None = None,
    str_len: int = 5,
) -> dict:
    """Generate one table's SoA columns (host numpy)."""
    rng = np.random.default_rng(seed)
    n = nblocks * MAX_RECORDS_PER_BLOCK
    if key_range is None:
        key_range = max(nblocks * 30, 1)

    recid = (recid_start + np.arange(n)).astype(np.uint32)
    if zipf_a is not None:
        # Zipf over the key range (heavy head), clipped into range.
        num = (rng.zipf(zipf_a, size=n) - 1) % key_range
        num = num.astype(np.uint32)
    else:
        num = rng.integers(0, key_range, size=n, dtype=np.uint32)

    strs = np.zeros((n, STR_PAD), dtype=np.uint8)
    strs[:, :str_len] = _LOWER[rng.integers(0, 26, size=(n, str_len))]
    if plant_hola and nblocks > 0:
        # row 1 of every block gets "Hola" (main.cpp:57-61)
        hola_rows = np.arange(nblocks) * MAX_RECORDS_PER_BLOCK + 1
        strs[hola_rows] = 0
        strs[hola_rows, : len(_HOLA)] = _HOLA
    valid = np.ones(n, dtype=bool)
    return {"recid": recid, "num": num, "strs": strs, "valid": valid}


def generate_batch(nblocks: int, seed: int = 42, **kw) -> RecordBatch:
    cols = generate_columns(nblocks, seed=seed, **kw)
    return RecordBatch.from_numpy(
        cols["recid"], cols["num"], cols["strs"], cols["valid"], normalize=False
    )


def generate_pair_files(
    path1: str, path2: str, nblocks: int, seed: int = 42, **kw
) -> None:
    """Write the two-file fixture the reference driver creates (main.cpp:36-79)."""
    from .blockfile import write_blockfile

    cols1 = generate_columns(nblocks, seed=seed, **kw)
    cols2 = generate_columns(nblocks, seed=seed + 1, **kw)
    cols2["recid"] = cols1["recid"]  # reference gives both files the same recids
    write_blockfile(path1, cols1)
    write_blockfile(path2, cols2)
