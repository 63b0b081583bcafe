"""Word-level data movement helpers.

Measured design point (tools/profile_ops.py, 1M rows on the target chip):
``lax.sort`` with a handful of operands ~0.2 ms; any random gather ~32 ms;
scatter ~59 ms; and sorts with many operands explode XLA compile time.
The engine therefore (a) sorts only small word sets, (b) uses at most one
fused record gather per operator output, and (c) never scatters.

``compact_rows`` — the only row-moving helper — is one 3-operand sort on
(drop, position) carrying the original index, then one ``take_fill``: the
stable-partition + single-gather form of "copy survivors forward".
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..batch import RecordBatch


def sort_words(
    key_words: list[jax.Array],
    payload: tuple[jax.Array, ...] = (),
    stable_iota: bool = True,
) -> tuple[tuple[jax.Array, ...], tuple[jax.Array, ...]]:
    """Sort key_words carrying word payload. Returns (sorted_keys, payload)."""
    n = key_words[0].shape[0]
    keys = [w.astype(jnp.uint32) for w in key_words]
    if stable_iota:
        keys = keys + [jnp.arange(n, dtype=jnp.int32)]
    out = jax.lax.sort(tuple(keys) + tuple(payload), num_keys=len(keys))
    nk = len(key_words)
    return tuple(out[:nk]), tuple(out[len(keys):])


def compact_words(
    keep: jax.Array, payload: tuple[jax.Array, ...]
) -> tuple[jax.Array, tuple[jax.Array, ...]]:
    """Word-level compaction: payload rows with keep=True to the front."""
    drop_w = (~keep).astype(jnp.uint32)
    _, out = sort_words([drop_w], payload)
    return jnp.sum(keep, dtype=jnp.int32), out


def compact_rows(
    batch: RecordBatch,
    keep: jax.Array,
    extra: tuple[jax.Array, ...] = (),
) -> tuple[RecordBatch, jax.Array, tuple[jax.Array, ...]]:
    """Keep-masked rows to the front, order preserved.

    One word sort + one record gather.  Rows past `count` are zeroed.
    Returns (batch, count, extras-compacted-alongside).
    """
    n = batch.nrows
    iota = jnp.arange(n, dtype=jnp.int32)
    count, out = compact_words(keep, (iota,) + tuple(extra))
    orig = out[0]
    gather_idx = jnp.where(iota < count, orig, jnp.int32(n))
    return batch.take_fill(gather_idx), count, out[1:]
