#!/usr/bin/env python
"""Pallas DMA-issue overhead: can chunked dynamic-offset copies beat lax.sort
for record movement?

The placement engine moves 1M x 35 u32 words in ~17 ms (5 payload sorts at
~20 GB/s effective).  A Pallas radix-permute would instead stream tiles
through VMEM and write per-bucket chunks to dynamic HBM offsets; its cost
is bandwidth + (#DMAs x issue overhead).  This measures a tile-copy kernel
that writes each VMEM tile back to HBM in G-row chunks at prefetched
dynamic offsets, for varying G — the slope vs 1/G gives the per-DMA cost,
and large-G throughput shows the achievable bandwidth of the pattern.

Layout note (measured on this image's Mosaic): a [N, W] i32 HBM array is
physically lane-tiled to (1, 128), so a W=36 view is misaligned (compile
error on slices) and would pay a 128/W bandwidth tax anyway.  Rows
therefore live FLAT: a "row" is 32 contiguous u32 (128 B) of a 1-D array,
and every slice/offset is a multiple of 128 words.

Identity offsets keep the copy verifiable; offsets still arrive as runtime
data (scalar prefetch), so nothing folds statically.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from database_technology_algorithms_tpu.utils.cache import enable_persistent_cache
from database_technology_algorithms_tpu.utils.profiling import timed_steady

N = 1 << 20  # rows
W = 32  # u32 words per row (one 128-B row)
T = 2048  # rows per tile


def make_kernel(G: int, interpret: bool = False):
    nchunks = T // G

    def kernel(starts_ref, in_hbm, out_hbm, scratch, in_sem, out_sems):
        t = pl.program_id(0)
        load = pltpu.make_async_copy(
            in_hbm.at[pl.ds(t * T * W, T * W)], scratch, in_sem
        )
        load.start()
        load.wait()
        base = starts_ref[t]

        def chunk_copy(j):
            return pltpu.make_async_copy(
                scratch.at[pl.ds(j * G * W, G * W)],
                out_hbm.at[pl.ds((base + j * G) * W, G * W)],
                out_sems.at[j % 8],
            )

        for j in range(nchunks):
            chunk_copy(j).start()
        for j in range(nchunks):
            # one wait per issued copy, matching descriptor byte counts
            chunk_copy(j).wait()

    def fn(x, starts):
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(N // T,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=pl.BlockSpec(memory_space=pl.ANY),
                scratch_shapes=[
                    pltpu.VMEM((T * W,), jnp.uint32),
                    pltpu.SemaphoreType.DMA,
                    pltpu.SemaphoreType.DMA((8,)),
                ],
            ),
            out_shape=jax.ShapeDtypeStruct((N * W,), jnp.uint32),
            interpret=interpret,
        )(starts, x)

    return fn


def main():
    global N
    interpret = "--cpu" in sys.argv
    if interpret:
        jax.config.update("jax_platforms", "cpu")
        N = 1 << 14
    enable_persistent_cache(tag="cpu" if interpret else "tpu")
    x = jax.random.randint(
        jax.random.PRNGKey(0), (N * W,), 0, 1 << 30, dtype=jnp.uint32
    )
    starts = jnp.arange(N // T, dtype=jnp.int32) * T
    jax.block_until_ready((x, starts))
    print(f"device: {jax.devices()[0]}  N={N} T={T} W={W}", flush=True)

    for G in (4, 8, 32, 128, 512, T):
        fn = make_kernel(G, interpret=interpret)
        if interpret:
            # correctness only
            def fi(x, s, _f=fn):
                return _f(x, s)

            out = jax.jit(fi)(x, starts)
            ok = bool(jnp.all(out == x))
            print(f"G={G:5d} interpret ok={ok}", flush=True)
            continue
        try:
            per, c = timed_steady(
                lambda x, s, _f=fn: _f(x, s).sum(), (x, starts)
            )
        except Exception as e:  # noqa: BLE001 — probe tool: record and move on
            print(f"G={G:5d} FAILED: {str(e).splitlines()[0][:120]}", flush=True)
            continue
        ndma = (N // T) * (T // G)
        bw = 2 * N * W * 4 / per / 1e9
        print(
            f"G={G:5d}  {per*1e3:8.3f} ms  {bw:7.1f} GB/s  "
            f"{ndma} DMAs -> {per/ndma*1e9:7.1f} ns/DMA  compile={c:.0f}s",
            flush=True,
        )


if __name__ == "__main__":
    main()
