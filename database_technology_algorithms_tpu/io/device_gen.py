"""On-device data generation (benchmark fixture without host↔HBM transfers).

Mirrors the reference generator's distribution (``main.cpp:41-77``): num
uniform in [0, key_range), 5-char lowercase strings, planted "Hola" every
100th row, sequential recids — but produced entirely on the accelerator with
``jax.random`` so benchmarks measure operator throughput, not PCIe/tunnel
ingest.  A Zipf option covers BASELINE config 4 (skewed keys).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..batch import (
    MAX_RECORDS_PER_BLOCK,
    RecordBatch,
    bucket_str_words,
    pack_str_words_device,
)


@functools.partial(jax.jit, static_argnames=("n", "key_range", "zipf_s", "str_len"))
def generate_device_batch(
    key: jax.Array,
    n: int,
    key_range: int,
    zipf_s: float | None = None,
    str_len: int = 5,
) -> RecordBatch:
    k_num, k_str = jax.random.split(key)
    recid = jnp.arange(n, dtype=jnp.uint32)
    if zipf_s is not None:
        # inverse-CDF Zipf over [0, key_range): P(k) ∝ (k+1)^-s via the
        # bounded Pareto approximation (u^(-1/(s-1)) style), clipped.
        u = jax.random.uniform(k_num, (n,), minval=1e-6, maxval=1.0)
        ranks = jnp.floor(u ** (-1.0 / (zipf_s - 1.0))) - 1.0
        num = jnp.clip(ranks, 0, key_range - 1).astype(jnp.uint32)
    else:
        num = jax.random.randint(k_num, (n,), 0, key_range, dtype=jnp.uint32)

    # narrow-width storage: the strings are str_len chars, so the batch
    # stores only the covering width bucket (batch.py trailing-zero
    # suppression) — whole-record movement then touches 3+K words, not 35
    width_bytes = 4 * bucket_str_words(-(-str_len // 4))
    letters = jax.random.randint(
        k_str, (n, str_len), 0, 26, dtype=jnp.uint8
    ) + jnp.uint8(ord("a"))
    strs = jnp.zeros((n, width_bytes), dtype=jnp.uint8).at[:, :str_len].set(letters)
    # plant "Hola" at row 1 of every 100-row "block" (main.cpp:57-61)
    hola = jnp.zeros((width_bytes,), dtype=jnp.uint8).at[:4].set(
        jnp.array([72, 111, 108, 97], dtype=jnp.uint8)
    )
    is_hola = (jnp.arange(n) % MAX_RECORDS_PER_BLOCK) == 1
    strs = jnp.where(is_hola[:, None], hola[None, :], strs)
    valid = jnp.ones(n, dtype=bool)
    return RecordBatch(
        recid=recid, num=num, strw=pack_str_words_device(strs), valid=valid
    )
