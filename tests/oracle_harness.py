"""Golden parity harness: compile and run the reference C++ as an oracle.

Builds ``tests/oracle/oracle_main.cpp`` (new driver code) against the
*unmodified* reference translation unit ``/root/reference/DatabaseProject.cpp``
and runs each operator in an isolated scratch directory (the reference
creates/deletes ``segment<N>.bin`` files in its CWD and hardcodes its dedup
intermediates there).

Known reference quirks the comparisons must account for (SURVEY.md §2):
* MergeSort: qsort is unstable → parity is on sorted full-record multisets.
* EliminateDuplicates: final partial output block never flushed
  (DatabaseProject.cpp:162-165) → the output file is missing
  ``nunique % 100`` tail rows; which duplicate survives is qsort-order
  dependent → parity is on key multisets + nunique.
* MergeJoin: final blocks claim nreserved=100 even when partial
  (DatabaseProject.cpp:489) → trust nres, not headers.
* HashJoin: final block header stores the *total* pair count
  (DatabaseProject.cpp:637) → same.
"""

from __future__ import annotations

import json
import os
import pathlib
import subprocess

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
REFERENCE = pathlib.Path("/root/reference")
BUILD_DIR = REPO / "build"
ORACLE_BIN = BUILD_DIR / "oracle"


def build_oracle() -> pathlib.Path:
    """Compile the oracle once (cached on mtime)."""
    src = REPO / "tests" / "oracle" / "oracle_main.cpp"
    ref_src = REFERENCE / "DatabaseProject.cpp"
    if ORACLE_BIN.exists():
        mt = ORACLE_BIN.stat().st_mtime
        if mt > src.stat().st_mtime and mt > ref_src.stat().st_mtime:
            return ORACLE_BIN
    BUILD_DIR.mkdir(exist_ok=True)
    cmd = [
        "g++", "-std=c++11", "-O2", "-w",
        f"-I{REFERENCE}",
        str(src), str(ref_src),
        "-o", str(ORACLE_BIN),
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    return ORACLE_BIN


def run_oracle(workdir: str, *args: str) -> dict:
    """Run one oracle op in `workdir`; returns the parsed stats JSON."""
    binpath = build_oracle()
    proc = subprocess.run(
        [str(binpath), *map(str, args)],
        cwd=workdir,
        capture_output=True,
        text=True,
        timeout=600,
        check=True,
    )
    # stats JSON is the last stdout line (the reference prints banners first)
    last = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")][-1]
    stats = json.loads(last)
    # clean up segment litter for the next op in the same dir
    for f in pathlib.Path(workdir).glob("segment*.bin"):
        f.unlink()
    return stats


def read_oracle_output(path: str, nrows: int | None = None) -> dict:
    """Read a reference *output* file, trusting `nrows` over block headers.

    Reference join writers lie in final-block headers (see module docstring):
    read every block as full, then truncate to the trusted row count.
    """
    from database_technology_algorithms_tpu.io.blockfile import (
        BLOCK_DTYPE,
        BLOCK_SIZE,
        MAX_RECORDS_PER_BLOCK,
    )
    from database_technology_algorithms_tpu.batch import (
        STR_LENGTH,
        STR_PAD,
        normalize_str_bytes,
    )

    raw = np.fromfile(path, dtype=np.uint8)
    nblocks = len(raw) // BLOCK_SIZE
    blocks = raw[: nblocks * BLOCK_SIZE].view(BLOCK_DTYPE)
    entries = blocks["entries"].reshape(-1)  # all rows, header-blind
    if nrows is None:
        nres = np.minimum(blocks["nreserved"], MAX_RECORDS_PER_BLOCK)
        nrows = int(nres.sum())
    entries = entries[:nrows]
    strs = np.zeros((nrows, STR_PAD), dtype=np.uint8)
    strs[:, :STR_LENGTH] = entries["str"]
    return {
        "recid": entries["recid"].astype(np.uint32),
        "num": entries["num"].astype(np.uint32),
        "strs": normalize_str_bytes(strs),
        "valid": entries["valid"].astype(bool),
    }


def record_multiset_key(cols: dict) -> np.ndarray:
    """Lexicographically sortable row fingerprint for multiset comparison."""
    n = len(cols["recid"])
    view = np.zeros((n, 4 + 4 + cols["strs"].shape[1]), dtype=np.uint8)
    view[:, 0:4] = cols["recid"].astype(">u4").view(np.uint8).reshape(n, 4)
    view[:, 4:8] = cols["num"].astype(">u4").view(np.uint8).reshape(n, 4)
    view[:, 8:] = cols["strs"]
    return view


def sorted_rows(cols: dict) -> np.ndarray:
    rows = record_multiset_key(cols)
    order = np.lexsort(rows.T[::-1])
    return rows[order]


def assert_same_multiset(a: dict, b: dict) -> None:
    ra, rb = sorted_rows(a), sorted_rows(b)
    assert ra.shape == rb.shape, f"row counts differ: {ra.shape} vs {rb.shape}"
    np.testing.assert_array_equal(ra, rb)


# ---------------------------------------------------------------------------
# Exact simulators of the reference's buggy streaming loops.
#
# Two reference defects make EliminateDuplicates (and everything built on it)
# diverge from clean DISTINCT semantics in input-dependent ways:
#   (a) `record_t previous` is read uninitialized for the first comparison
#       (DatabaseProject.cpp:117); in this build the stack slot is zeroed, so
#       a first sorted record with an all-zero key is silently dropped
#       (verified empirically: all-num-0 input reports nunique=0).
#   (b) the read loop is `while(!feof){fread; process}` (:121-123): the fread
#       that hits EOF fails *without* setting the buffer, so the previously
#       read block is processed a second time.  Whether that block is empty
#       depends on how MergeSort's drain happened to flush (:329-348), so the
#       inflation is input- and field-dependent.
# Rather than hand-waving tolerances, these simulators replay the exact loops
# over the oracle's own intermediate block files; parity tests then assert
#   oracle binary == simulator          (validates our understanding), and
#   TPU engine   == clean semantics     (the documented deviation).
# ---------------------------------------------------------------------------

ZERO_RECORD = (0, 0, b"")


def read_blocks_rows(path: str):
    """Per-block record tuples [(recid, num, strbytes), ...], honoring
    nreserved, *preserving empty/partial trailing blocks*."""
    from database_technology_algorithms_tpu.io.blockfile import (
        BLOCK_DTYPE,
        BLOCK_SIZE,
        MAX_RECORDS_PER_BLOCK,
    )

    raw = np.fromfile(path, dtype=np.uint8)
    nblocks = len(raw) // BLOCK_SIZE
    blocks = raw[: nblocks * BLOCK_SIZE].view(BLOCK_DTYPE)
    out = []
    for b in range(nblocks):
        nres = int(min(blocks["nreserved"][b], MAX_RECORDS_PER_BLOCK))
        ent = blocks["entries"][b]
        rows = []
        for i in range(nres):
            srow = ent["str"][i]
            nz = np.nonzero(srow == 0)[0]
            end = nz[0] if len(nz) else len(srow)
            rows.append((int(ent["recid"][i]), int(ent["num"][i]), srow[:end].tobytes()))
        out.append(rows)
    return out


def ref_cmp(a, b, field: int) -> int:
    """The reference comparators (DatabaseProject.cpp:44-92)."""
    if field == 0:
        ka, kb = a[0], b[0]
    elif field == 1:
        ka, kb = a[1], b[1]
    elif field == 2:
        ka, kb = a[2], b[2]
    else:
        ka, kb = (a[1], a[2]), (b[1], b[2])
    return -1 if ka < kb else (1 if ka > kb else 0)


def simulate_elimdup(sorted_blockfile: str, field: int):
    """Replay EliminateDuplicates (DatabaseProject.cpp:94-170) exactly.

    Returns (nunique, emitted_rows, flushed_rows): emitted_rows is the full
    unique stream the loop produced (including re-scan duplicates);
    flushed_rows is what actually reaches the output file (tail-drop bug:
    only full 100-record blocks are ever written, :147-158).
    """
    blocks = read_blocks_rows(sorted_blockfile)
    if blocks:
        blocks = blocks + [blocks[-1]]  # feof re-scan of the last-read block
    prev = ZERO_RECORD
    emitted = []
    outindex = 0
    flushed = 0
    for rows in blocks:
        for rec in rows:
            if ref_cmp(rec, prev, field) != 0:
                if outindex == 100:
                    flushed += 100
                    outindex = 0
                emitted.append(rec)
                outindex += 1
            prev = rec
    return len(emitted), emitted, emitted[:flushed]


def simulate_mergejoin(rows_r, rows_s, field: int):
    """Replay MergeJoin's two-pointer merge (DatabaseProject.cpp:414-482)
    over flat row streams (its block reads memset before fread, so EOF is
    clean there). Emits the R-side record per match (:454).
    Returns (nres, emitted_rows)."""
    i = j = 0
    out = []
    while i < len(rows_r) and j < len(rows_s):
        c = ref_cmp(rows_r[i], rows_s[j], field)
        if c < 0:
            i += 1
        elif c > 0:
            j += 1
        else:
            out.append(rows_r[i])
            i += 1
            j += 1
    return len(out), out
