"""Pure-numpy/python model of the reference operator semantics.

Property-test oracle (SURVEY.md §4b): tiny, obviously-correct implementations
of the four key domains and operator semantics, against which the TPU engine
is diffed on randomized inputs.  Key order mirrors the reference comparators
(DatabaseProject.cpp:44-92): recid/num unsigned ascending, str = strcmp
(bytewise unsigned on NUL-terminated bytes), numstr = (num, str).
"""

from __future__ import annotations

import numpy as np


def cstr(row: np.ndarray) -> bytes:
    """Bytes up to the first NUL (strcmp view of a str column row)."""
    row = np.asarray(row, dtype=np.uint8)
    nz = np.nonzero(row == 0)[0]
    end = nz[0] if len(nz) else len(row)
    return row[:end].tobytes()


def key_of(cols: dict, i: int, field: int):
    if field == 0:
        return (int(cols["recid"][i]),)
    if field == 1:
        return (int(cols["num"][i]),)
    if field == 2:
        return (cstr(cols["strs"][i]),)
    if field == 3:
        return (int(cols["num"][i]), cstr(cols["strs"][i]))
    raise ValueError(field)


def all_keys(cols: dict, field: int) -> list:
    n = len(cols["recid"])
    return [key_of(cols, i, field) for i in range(n)]


def model_sort_perm(cols: dict, field: int) -> list[int]:
    """Total-order sort permutation: (key, original index)."""
    keys = all_keys(cols, field)
    return sorted(range(len(keys)), key=lambda i: (keys[i], i))


def model_distinct(cols: dict, field: int) -> tuple[list[int], int]:
    """Surviving row indices (first of each group in total order), nunique."""
    perm = model_sort_perm(cols, field)
    keys = all_keys(cols, field)
    out, seen = [], set()
    for i in perm:
        if keys[i] not in seen:
            seen.add(keys[i])
            out.append(i)
    return out, len(out)


def model_merge_join(r: dict, s: dict, field: int) -> tuple[list[int], int]:
    """R-side surviving row indices for matched keys, nres."""
    r_idx, _ = model_distinct(r, field)
    s_keys = set(all_keys(s, field))
    r_keys = all_keys(r, field)
    matched = [i for i in r_idx if r_keys[i] in s_keys]
    return matched, len(matched)


def model_hash_join(build: dict, probe: dict, field: int):
    """(matched bool list, mult list, nres) with reference multiplicity rules."""
    from collections import Counter

    bkeys = all_keys(build, field)
    counts = Counter(bkeys)
    pkeys = all_keys(probe, field)
    matched = [k in counts for k in pkeys]
    if field == 3:
        mult = [counts.get(k, 0) for k in pkeys]
    else:
        mult = [1 if m else 0 for m in matched]
    return matched, mult, sum(mult)


def model_group_aggregate(cols: dict, field: int):
    """dict key -> (count, sum, min, max of num), plus sorted key list."""
    keys = all_keys(cols, field)
    nums = cols["num"]
    agg = {}
    for i, k in enumerate(keys):
        c, s, mn, mx = agg.get(k, (0, 0, None, None))
        v = int(nums[i])
        agg[k] = (
            c + 1,
            s + v,
            v if mn is None else min(mn, v),
            v if mx is None else max(mx, v),
        )
    return agg, sorted(agg.keys())


def random_cols(
    rng: np.random.Generator,
    n: int,
    key_range: int = 50,
    str_pool: list[bytes] | None = None,
    str_pad: int = 128,
) -> dict:
    """Random columns with deliberately collision-heavy keys and strings."""
    if str_pool is None:
        # pool includes shared-8-byte-prefix strings to exercise the
        # prefix-sort fallback, empty strings, and >8-char strings
        str_pool = [
            b"", b"a", b"ab", b"Hola", b"hola",
            b"prefix00A", b"prefix00B", b"prefix00",
            b"longsharedprefix_x", b"longsharedprefix_y",
            b"zzz", b"Zzz",
        ]
    strs = np.zeros((n, str_pad), dtype=np.uint8)
    choices = rng.integers(0, len(str_pool), size=n)
    for i in range(n):
        b = np.frombuffer(str_pool[choices[i]], dtype=np.uint8)
        strs[i, : len(b)] = b
    return {
        "recid": rng.integers(0, key_range, size=n, dtype=np.uint32),
        "num": rng.integers(0, key_range, size=n, dtype=np.uint32),
        "strs": strs,
        "valid": np.ones(n, dtype=bool),
    }


def to_batch(cols: dict):
    from database_technology_algorithms_tpu.batch import RecordBatch

    return RecordBatch.from_numpy(
        cols["recid"], cols["num"], cols["strs"], cols["valid"]
    )
