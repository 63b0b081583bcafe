"""Columnar record batches — the TPU-native heir of the reference's row format.

The reference engine (syfantid/Database-Technology-Algorithms) stores data as
fixed 140-byte row structs packed into 14,016-byte blocks of 100 records
(``/root/reference/dbtproj.h:20-38``):

    record_t { recid u32; num u32; str char[120]; valid bool; dummy1/2 u32 }
    block_t  { blockid u32; nreserved u32; entries[100]; valid; misc; dummy }

A row-struct (AoS) layout is hostile to a vector machine: every kernel would
stride 140 bytes to touch a 4-byte key.  Here the same logical schema is a
**structure-of-arrays** pytree living in HBM:

    recid : uint32[N]
    num   : uint32[N]
    strs  : uint8[N, 128]   (str bytes, NUL-normalized, zero-padded 120 -> 128)
    valid : bool[N]

128 = STR_PAD keeps the trailing axis lane-aligned (TPU lane width is 128).
``dummy1/dummy2`` are scratch fields in the reference (it abuses them to store
heap provenance, ``DatabaseProject.cpp:279,307``) and carry no data — they do
not exist here.

NUL-normalization: the reference compares strings with ``strcmp``
(``DatabaseProject.cpp:61-67``), which stops at the first NUL; bytes after it
are uninitialized garbage on disk (the generator ``strcpy``s short strings over
a reused struct, ``main.cpp:49``).  We zero everything from the first NUL
onward at ingest so that plain bytewise comparison of the full 128-byte row
equals ``strcmp`` order/equality (C11 mandates unsigned-char comparison).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

STR_LENGTH = 120  # matches reference STR_LENGTH, dbtproj.h:16
STR_PAD = 128  # lane-aligned storage width on device
MAX_RECORDS_PER_BLOCK = 100  # dbtproj.h:17

# Field selectors. The reference API takes *char* field codes '0'..'3'
# (main.cpp:114,121 pass char literals despite the docs saying int). We accept
# both chars and ints and canonicalize to ints.
FIELD_RECID = 0
FIELD_NUM = 1
FIELD_STR = 2
FIELD_NUMSTR = 3

_FIELD_ALIASES = {
    "0": 0, "1": 1, "2": 2, "3": 3,
    0: 0, 1: 1, 2: 2, 3: 3,
    "recid": 0, "num": 1, "str": 2, "numstr": 3,
}


def canonical_field(field) -> int:
    """Map a reference-style field selector (char '0'..'3', int, or name) to int."""
    try:
        return _FIELD_ALIASES[field]
    except KeyError:
        raise ValueError(f"invalid field selector {field!r}; expected 0..3") from None


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class RecordBatch:
    """A columnar batch of records (SoA pytree). All columns share length N."""

    recid: jax.Array  # uint32[N]
    num: jax.Array  # uint32[N]
    strs: jax.Array  # uint8[N, STR_PAD], NUL-normalized
    valid: jax.Array  # bool[N]

    @property
    def nrows(self) -> int:
        return self.recid.shape[0]

    def __len__(self) -> int:
        return self.nrows

    def take(self, idx: jax.Array) -> "RecordBatch":
        """Gather rows by index (the SoA analogue of a record memcpy)."""
        return RecordBatch(
            recid=jnp.take(self.recid, idx, axis=0),
            num=jnp.take(self.num, idx, axis=0),
            strs=jnp.take(self.strs, idx, axis=0),
            valid=jnp.take(self.valid, idx, axis=0),
        )

    def take_fill(self, idx: jax.Array) -> "RecordBatch":
        """Gather rows; out-of-range indices yield zero rows.

        Lets sort/compact be fused into ONE payload gather: the caller
        scatters surviving source indices into a dense prefix (padding = n)
        and gathers full records exactly once.
        """
        return RecordBatch(
            recid=jnp.take(self.recid, idx, axis=0, mode="fill", fill_value=0),
            num=jnp.take(self.num, idx, axis=0, mode="fill", fill_value=0),
            strs=jnp.take(self.strs, idx, axis=0, mode="fill", fill_value=0),
            valid=jnp.take(self.valid, idx, axis=0, mode="fill", fill_value=False),
        )

    def slice(self, start: int, size: int) -> "RecordBatch":
        return RecordBatch(
            recid=jax.lax.dynamic_slice_in_dim(self.recid, start, size, 0),
            num=jax.lax.dynamic_slice_in_dim(self.num, start, size, 0),
            strs=jax.lax.dynamic_slice_in_dim(self.strs, start, size, 0),
            valid=jax.lax.dynamic_slice_in_dim(self.valid, start, size, 0),
        )

    @staticmethod
    def concat(batches: list["RecordBatch"]) -> "RecordBatch":
        return RecordBatch(
            recid=jnp.concatenate([b.recid for b in batches]),
            num=jnp.concatenate([b.num for b in batches]),
            strs=jnp.concatenate([b.strs for b in batches]),
            valid=jnp.concatenate([b.valid for b in batches]),
        )

    # ---- host-side conveniences -------------------------------------------

    @staticmethod
    def from_numpy(
        recid: np.ndarray,
        num: np.ndarray,
        strs: np.ndarray,
        valid: Optional[np.ndarray] = None,
        normalize: bool = True,
    ) -> "RecordBatch":
        """Build a batch from host arrays. `strs` is uint8[N, 120 or 128]."""
        n = recid.shape[0]
        if strs.shape[1] < STR_PAD:
            padded = np.zeros((n, STR_PAD), dtype=np.uint8)
            padded[:, : strs.shape[1]] = strs
            strs = padded
        if normalize:
            strs = normalize_str_bytes(strs)
        if valid is None:
            valid = np.ones(n, dtype=bool)
        return RecordBatch(
            recid=jnp.asarray(recid, dtype=jnp.uint32),
            num=jnp.asarray(num, dtype=jnp.uint32),
            strs=jnp.asarray(strs, dtype=jnp.uint8),
            valid=jnp.asarray(valid, dtype=bool),
        )

    def to_numpy(self) -> dict:
        return {
            "recid": np.asarray(self.recid),
            "num": np.asarray(self.num),
            "strs": np.asarray(self.strs),
            "valid": np.asarray(self.valid),
        }

    def str_list(self) -> list[bytes]:
        """Decode strings to python bytes (up to first NUL) — for tests/debug."""
        raw = np.asarray(self.strs[:, :STR_LENGTH])
        out = []
        for row in raw:
            nz = np.nonzero(row == 0)[0]
            end = nz[0] if len(nz) else STR_LENGTH
            out.append(row[:end].tobytes())
        return out


def normalize_str_bytes(strs: np.ndarray) -> np.ndarray:
    """Zero every byte at or after the first NUL, per row (host-side numpy).

    Makes bytewise equality/order of the padded row equal strcmp semantics
    (reference comparator: DatabaseProject.cpp:57-68).
    """
    strs = np.ascontiguousarray(strs, dtype=np.uint8)
    keep = np.cumprod(strs != 0, axis=1, dtype=np.uint8).astype(bool)
    return np.where(keep, strs, 0)


def normalize_str_bytes_device(strs: jax.Array) -> jax.Array:
    """Device-side NUL-normalization (same contract as normalize_str_bytes)."""
    keep = jnp.cumprod((strs != 0).astype(jnp.uint8), axis=1).astype(bool)
    return jnp.where(keep, strs, jnp.uint8(0))


def make_batch_from_strings(
    recid: np.ndarray, num: np.ndarray, strings: list[bytes]
) -> RecordBatch:
    """Test helper: build a batch from python byte-strings."""
    n = len(strings)
    strs = np.zeros((n, STR_PAD), dtype=np.uint8)
    for i, s in enumerate(strings):
        b = np.frombuffer(s[:STR_LENGTH], dtype=np.uint8)
        strs[i, : len(b)] = b
    return RecordBatch.from_numpy(
        np.asarray(recid, dtype=np.uint32), np.asarray(num, dtype=np.uint32), strs
    )
