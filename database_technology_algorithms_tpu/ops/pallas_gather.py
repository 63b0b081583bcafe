"""Pallas row-gather kernel: pipelined per-row DMA materialization.

The one expensive primitive left in the engine is the final record gather
(XLA gather ≈ 32 ns/row on the target chip regardless of row width).  This
kernel tries to beat it with explicit DMA pipelining: the gather indices are
scalar-prefetched, and each grid step issues a deep window of row-sized
HBM→VMEM async copies (one per output row), overlapping DMA issue with
completion, then ships the assembled tile back to HBM through the normal
Pallas output pipeline.

Rows are (W,) u32 vectors (the RecordBatch payload packed side by side), so
one row copy is a contiguous 4·W-byte DMA.  Out-of-range indices (the
padding convention) read row N of a source array padded with one zero row.

STATUS: experimental, NOT wired into the engine.  Per-row DMAs are too
small (144 B) to amortize issue overhead, and XLA's fused row gather
measures faster on the target chip (tools/bench_gather.py /
tools/bench_calibrate.py) — kept as the negative-result record and as the
starting point for a tile-granularity variant.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEPTH = 16  # outstanding row DMAs


def _gather_kernel(idx_ref, src_hbm, out_ref, scratch, sems):
    tile = out_ref.shape[0]
    prog = pl.program_id(0)
    base = prog * tile

    def issue(r, slot):
        return pltpu.make_async_copy(
            src_hbm.at[idx_ref[base + r]],
            scratch.at[slot],
            sems.at[slot],
        )

    # warm-up: fill the pipeline
    for r in range(DEPTH):
        issue(r, r).start()

    def body(r, _):
        slot = r % DEPTH
        issue(r, slot).wait()
        out_ref[r, :] = scratch[slot]

        @pl.when(r + DEPTH < tile)
        def _():
            issue(r + DEPTH, (r + DEPTH) % DEPTH).start()

        return 0

    jax.lax.fori_loop(0, tile, body, 0)


def pallas_row_gather(
    src: jax.Array, idx: jax.Array, tile: int = 512, interpret: bool = False
) -> jax.Array:
    """out[i] = src[idx[i]] for 2-D u32 src; idx may include row N (padding).

    src must already carry a trailing padding row (callers append one zero
    row); idx values in [0, N] inclusive.
    """
    m = idx.shape[0]
    w = src.shape[1]
    assert m % tile == 0, "index count must be a multiple of tile"
    grid = (m // tile,)

    return pl.pallas_call(
        _gather_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(
                (tile, w), lambda i, idx_ref: (i, 0), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[
                pltpu.VMEM((DEPTH, w), jnp.uint32),
                pltpu.SemaphoreType.DMA((DEPTH,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((m, w), jnp.uint32),
        interpret=interpret,
    )(idx.astype(jnp.int32), src)
