"""ctypes bindings for the native IO library (native/dbtio.cpp).

Builds on demand with the repo Makefile (g++); every entry point has a pure
numpy fallback in blockfile.py, so the engine works without a compiler —
the native path is the production fast path for multi-GB block files.
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess
import threading

import numpy as np

from ..batch import STR_PAD

_REPO = pathlib.Path(__file__).resolve().parent.parent.parent
_LIB_PATH = _REPO / "build" / "libdbtio.so"
_LOCK = threading.Lock()
_LIB = None
_TRIED = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", str(_REPO / "native"), f"BUILD={_REPO / 'build'}"],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return _LIB_PATH.exists()
    except Exception:
        return False


def get_lib():
    """The loaded library, building it if needed; None if unavailable."""
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        if not _LIB_PATH.exists() and not _build():
            return None
        try:
            lib = ctypes.CDLL(str(_LIB_PATH))
        except OSError:
            return None
        u32p = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        lib.dbt_count_rows.argtypes = [ctypes.c_char_p]
        lib.dbt_count_rows.restype = ctypes.c_long
        lib.dbt_read_blockfile.argtypes = [
            ctypes.c_char_p, u32p, u32p, u8p, u8p, ctypes.c_long,
        ]
        lib.dbt_read_blockfile.restype = ctypes.c_long
        lib.dbt_write_blockfile.argtypes = [
            ctypes.c_char_p, u32p, u32p, u8p, u8p, ctypes.c_long,
        ]
        lib.dbt_write_blockfile.restype = ctypes.c_long
        lib.dbt_generate_pair.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_long,
            ctypes.c_uint32, ctypes.c_uint32,
        ]
        lib.dbt_generate_pair.restype = ctypes.c_long
        try:
            lib.dbt_read_blockfile_mt.argtypes = [
                ctypes.c_char_p, u32p, u32p, u8p, u8p, ctypes.c_long,
                ctypes.c_int,
            ]
            lib.dbt_read_blockfile_mt.restype = ctypes.c_long
        except AttributeError:
            pass  # older .so without the threaded reader
        _LIB = lib
        return _LIB


def read_blockfile_native(path: str, nthreads: int | None = None) -> dict | None:
    lib = get_lib()
    if lib is None:
        return None
    n = lib.dbt_count_rows(path.encode())
    if n < 0:
        return None
    recid = np.empty(n, np.uint32)
    num = np.empty(n, np.uint32)
    strs = np.empty((n, STR_PAD), np.uint8)
    valid = np.empty(n, np.uint8)
    if hasattr(lib, "dbt_read_blockfile_mt"):
        # multithreaded mmap transpose (block ranges -> disjoint output
        # ranges, no synchronization); threads default to min(cpu, 8)
        import os

        t = nthreads or min(os.cpu_count() or 1, 8)
        got = lib.dbt_read_blockfile_mt(
            path.encode(), recid, num, strs, valid, n, int(t)
        )
    else:
        got = lib.dbt_read_blockfile(path.encode(), recid, num, strs, valid, n)
    if got != n:
        return None
    return {"recid": recid, "num": num, "strs": strs, "valid": valid.astype(bool)}


def write_blockfile_native(path: str, cols: dict) -> int | None:
    lib = get_lib()
    if lib is None:
        return None
    recid = np.ascontiguousarray(cols["recid"], np.uint32)
    num = np.ascontiguousarray(cols["num"], np.uint32)
    strs = np.ascontiguousarray(cols["strs"], np.uint8)
    if strs.shape[1] != STR_PAD:
        padded = np.zeros((len(recid), STR_PAD), np.uint8)
        padded[:, : strs.shape[1]] = strs
        strs = padded
    valid = np.ascontiguousarray(
        np.asarray(cols.get("valid", np.ones(len(recid), bool))), np.uint8
    )
    nblocks = lib.dbt_write_blockfile(path.encode(), recid, num, strs, valid, len(recid))
    return None if nblocks < 0 else int(nblocks)


def generate_pair_native(
    path1: str, path2: str, nblocks: int, seed: int, key_range: int
) -> int | None:
    lib = get_lib()
    if lib is None:
        return None
    n = lib.dbt_generate_pair(
        path1.encode(), path2.encode(), nblocks, seed, max(key_range, 1)
    )
    return None if n < 0 else int(n)
