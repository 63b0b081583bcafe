"""Columnar record batches — the TPU-native heir of the reference's row format.

The reference engine (syfantid/Database-Technology-Algorithms) stores data as
fixed 140-byte row structs packed into 14,016-byte blocks of 100 records
(``/root/reference/dbtproj.h:20-38``):

    record_t { recid u32; num u32; str char[120]; valid bool; dummy1/2 u32 }
    block_t  { blockid u32; nreserved u32; entries[100]; valid; misc; dummy }

Device layout here is a **structure-of-arrays over 32-bit lanes**:

    recid : uint32[N]
    num   : uint32[N]
    strw  : uint32[N, K]    string bytes packed big-endian, 4 per word,
                            NUL-normalized, zero-padded
    valid : bool[N]

**Narrow-width storage (trailing-zero suppression).** K is a static
per-batch width from ``STR_WIDTH_BUCKETS`` (2..32 words); the logical
string column is always the 32-word (128-byte) view with words >= K equal
to zero.  NUL-normalization makes this exact: a fully-zero word can only
occur after the terminator, so trimming all-zero trailing word columns
loses nothing, and every comparison/hash/sort on the narrow view equals
the full-width result.  Ingestion (``from_numpy``) measures the real
maximum string length and picks the smallest bucket; the reference
workload's 5-char strings store in K=2 words, so whole-record movement
(placement sorts, shuffles, spills) touches 3+K = 5 words instead of 35 —
the same trick as columnar engines' short-string optimization
(German-style strings), applied to the TPU's sort-based movement engine.
Batches of different widths interoperate: ``concat`` pads to the max
width, and width-asymmetric joins hash/compare width-invariantly.

Why words, not bytes: this TPU executes ``lax.sort`` at near-memory speed but
random gather/scatter at ~0.25 GB/s (measured: 1M-row gather = 32 ms vs
key sort = 0.1 ms).  The engine therefore moves records *through sorts* —
every column rides along as a sort operand — and u32 words are the lane-
native unit for that.  Big-endian packing makes word-lexicographic order ==
bytewise order == ``strcmp`` order (C11 7.24.4 compares unsigned chars;
NUL-normalization at ingest zeroes the garbage the reference leaves after
the terminator, main.cpp:49).

``dummy1/dummy2`` are scratch fields in the reference (it abuses them for
heap provenance, ``DatabaseProject.cpp:279,307``) and carry no data.

Host-side column dicts (IO, tests, the parity oracle) keep the byte view:
``strs`` as uint8[N,128]; the boundary conversion is a zero-copy
numpy view (big-endian u32 reinterpret).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

STR_LENGTH = 120  # matches reference STR_LENGTH, dbtproj.h:16
STR_PAD = 128  # lane-aligned logical width (bytes)
STR_WORDS = STR_PAD // 4  # 32 u32 words per full-width string
MAX_RECORDS_PER_BLOCK = 100  # dbtproj.h:17

# permitted static strw widths (words).  A small set bounds the number of
# distinct compiled programs; minimum 2 keeps the default sort prefix
# (cfg.str_prefix_words = 2) a plain slice for every batch.
STR_WIDTH_BUCKETS = (2, 4, 8, 16, 32)


def bucket_str_words(nwords: int) -> int:
    """Smallest permitted static width covering `nwords` live words."""
    for b in STR_WIDTH_BUCKETS:
        if b >= nwords:
            return b
    return STR_WORDS


def narrow_str_bytes(strs: np.ndarray) -> np.ndarray:
    """Trim a host byte matrix to the smallest covering bucket width.

    Returns uint8[N, 4K] with K from STR_WIDTH_BUCKETS; only all-zero
    trailing columns are dropped (exact under NUL-normalization).
    """
    strs = np.ascontiguousarray(strs, dtype=np.uint8)
    n = strs.shape[0]
    nz = np.flatnonzero(strs.any(axis=0)) if n else np.array([], np.int64)
    live_bytes = int(nz[-1]) + 1 if nz.size else 0
    width = 4 * bucket_str_words(-(-live_bytes // 4))
    if strs.shape[1] == width:
        return strs
    if strs.shape[1] > width:
        return strs[:, :width]
    out = np.zeros((n, width), dtype=np.uint8)
    out[:, : strs.shape[1]] = strs
    return out

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


def pack_str_bytes(strs_u8: np.ndarray) -> np.ndarray:
    """Host: uint8[N,128] -> big-endian uint32[N,32] (zero-copy view)."""
    strs_u8 = np.ascontiguousarray(strs_u8, dtype=np.uint8)
    return strs_u8.view(">u4").astype(np.uint32)


def unpack_str_words(strw: np.ndarray) -> np.ndarray:
    """Host: uint32[N,K] -> uint8[N,4K]."""
    k = strw.shape[1]
    return (
        np.ascontiguousarray(strw, dtype=np.uint32)
        .astype(">u4")
        .view(np.uint8)
        .reshape(-1, 4 * k)
    )


def pack_str_words_device(strs_u8: jax.Array) -> jax.Array:
    """Device: uint8[N,4K] -> big-endian uint32[N,K]."""
    n, nbytes = strs_u8.shape
    b = strs_u8.astype(jnp.uint32).reshape(n, nbytes // 4, 4)
    return (b[..., 0] << 24) | (b[..., 1] << 16) | (b[..., 2] << 8) | b[..., 3]


def unpack_str_words_device(strw: jax.Array) -> jax.Array:
    """Device: uint32[N,K] -> uint8[N,4K]."""
    n, k = strw.shape
    b = jnp.stack(
        [(strw >> 24) & 0xFF, (strw >> 16) & 0xFF, (strw >> 8) & 0xFF, strw & 0xFF],
        axis=-1,
    )
    return b.astype(jnp.uint8).reshape(n, 4 * k)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class RecordBatch:
    """A columnar batch of records (SoA pytree). All columns share length N."""

    recid: jax.Array  # uint32[N]
    num: jax.Array  # uint32[N, ]
    strw: jax.Array  # uint32[N, K<=STR_WORDS], big-endian packed, NUL-normalized
    valid: jax.Array  # bool[N]

    @property
    def nrows(self) -> int:
        return self.recid.shape[0]

    @property
    def str_words(self) -> int:
        """Static width K of the string column (words >= K are logically 0)."""
        return self.strw.shape[1]

    def __len__(self) -> int:
        return self.nrows

    def pad_str_words(self, k: int) -> "RecordBatch":
        """Widen the string column to k words (zero-pad; no-op if already >=)."""
        cur = self.str_words
        if cur >= k:
            return self
        pad = jnp.zeros((self.nrows, k - cur), dtype=jnp.uint32)
        return RecordBatch(
            recid=self.recid,
            num=self.num,
            strw=jnp.concatenate([self.strw, pad], axis=1),
            valid=self.valid,
        )

    def payload_words(self) -> list[jax.Array]:
        """Every live column as u32 sort operands (the movement form).

        3 + K words: the narrow-width invariant means words >= K need not
        move — they are reconstructed as zeros by ``from_payload_words``.
        """
        return [
            self.recid,
            self.num,
            self.valid.astype(jnp.uint32),
        ] + [self.strw[:, j] for j in range(self.str_words)]

    @staticmethod
    def from_payload_words(words: list[jax.Array]) -> "RecordBatch":
        recid, num, valid = words[0], words[1], words[2]
        strw = jnp.stack(words[3:], axis=1)
        return RecordBatch(
            recid=recid, num=num, strw=strw, valid=valid.astype(bool)
        )

    def take(self, idx: jax.Array) -> "RecordBatch":
        """Gather rows by index. NOTE: random gathers are slow on TPU
        (~32 ns/row measured); prefer ops/movement.py sort-based movement
        on the hot path."""
        return RecordBatch(
            recid=jnp.take(self.recid, idx, axis=0),
            num=jnp.take(self.num, idx, axis=0),
            strw=jnp.take(self.strw, idx, axis=0),
            valid=jnp.take(self.valid, idx, axis=0),
        )

    def take_fill(self, idx: jax.Array) -> "RecordBatch":
        """Gather rows; out-of-range indices yield zero rows. Same caveat."""
        return RecordBatch(
            recid=jnp.take(self.recid, idx, axis=0, mode="fill", fill_value=0),
            num=jnp.take(self.num, idx, axis=0, mode="fill", fill_value=0),
            strw=jnp.take(self.strw, idx, axis=0, mode="fill", fill_value=0),
            valid=jnp.take(self.valid, idx, axis=0, mode="fill", fill_value=False),
        )

    def slice(self, start: int, size: int) -> "RecordBatch":
        return RecordBatch(
            recid=jax.lax.dynamic_slice_in_dim(self.recid, start, size, 0),
            num=jax.lax.dynamic_slice_in_dim(self.num, start, size, 0),
            strw=jax.lax.dynamic_slice_in_dim(self.strw, start, size, 0),
            valid=jax.lax.dynamic_slice_in_dim(self.valid, start, size, 0),
        )

    @staticmethod
    def concat(batches: list["RecordBatch"]) -> "RecordBatch":
        k = max(b.str_words for b in batches)
        batches = [b.pad_str_words(k) for b in batches]
        return RecordBatch(
            recid=jnp.concatenate([b.recid for b in batches]),
            num=jnp.concatenate([b.num for b in batches]),
            strw=jnp.concatenate([b.strw for b in batches]),
            valid=jnp.concatenate([b.valid for b in batches]),
        )

    # ---- host-side conveniences -------------------------------------------

    @staticmethod
    def from_numpy(
        recid: np.ndarray,
        num: np.ndarray,
        strs: Optional[np.ndarray] = None,
        valid: Optional[np.ndarray] = None,
        normalize: bool = True,
        str_words: Optional[int] = None,
    ) -> "RecordBatch":
        """Build a batch from host arrays. `strs` is uint8[N, <=128] bytes.

        The stored width is the smallest ``STR_WIDTH_BUCKETS`` entry
        covering the longest actual string (trailing-zero suppression —
        exact, see module docstring); pass ``str_words`` to force a width
        (e.g. for multi-host paths that need a pre-agreed global shape).
        """
        n = recid.shape[0]
        if strs is None:
            strs = np.zeros((n, 8), dtype=np.uint8)
        strs = np.ascontiguousarray(strs, dtype=np.uint8)
        if normalize:
            strs = normalize_str_bytes(strs)
        if str_words is None:
            strs = narrow_str_bytes(strs)
        else:
            width = 4 * str_words
            if strs.shape[1] != width:
                sized = np.zeros((n, width), dtype=np.uint8)
                keep = min(width, strs.shape[1])
                sized[:, :keep] = strs[:, :keep]
                strs = sized
        if valid is None:
            valid = np.ones(n, dtype=bool)
        return RecordBatch(
            recid=jnp.asarray(recid, dtype=jnp.uint32),
            num=jnp.asarray(num, dtype=jnp.uint32),
            strw=jnp.asarray(pack_str_bytes(strs)),
            valid=jnp.asarray(valid, dtype=bool),
        )

    def to_numpy(self) -> dict:
        """Host columns with the byte-view string column (`strs` u8[N,128])."""
        narrow = unpack_str_words(np.asarray(self.strw))
        strs = np.zeros((self.nrows, STR_PAD), dtype=np.uint8)
        strs[:, : narrow.shape[1]] = narrow
        return {
            "recid": np.asarray(self.recid),
            "num": np.asarray(self.num),
            "strs": strs,
            "valid": np.asarray(self.valid),
        }

    def str_list(self) -> list[bytes]:
        """Decode strings to python bytes (up to first NUL) — for tests/debug."""
        raw = self.to_numpy()["strs"][:, :STR_LENGTH]
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
    """Device-side NUL-normalization over a byte view."""
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
