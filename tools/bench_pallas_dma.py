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

Layout notes (measured on this image's Mosaic, r3):
  * [N, W] i32 HBM arrays with W<128 are lane-padded to 128 — a 128/W
    bandwidth tax and misaligned slices (compile error).  Bulk record data
    must live as [M, 128] u32 (one array row = 128 u32 = 4 record-rows of
    32 words).
  * dynamic dim-0 offsets must be PROVABLY divisible by the sublane tile
    (8): wrap every runtime offset in pl.multiple_of(off, 8).  Chunk
    offsets/sizes are therefore 8-row (= 32 record-row = 4 KB) aligned —
    exact-fit variable-size segments are impossible; padded cells only.

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

N = 1 << 20  # record rows
W = 32  # u32 words per record row (128 B)
T = 2048  # record rows per tile


def make_kernel(G: int, n: int, interpret: bool = False):
    """Copy kernel: per tile, one load DMA + T/G chunked store DMAs."""
    m = n * W // 128  # 2-D rows
    tr = T * W // 128  # tile in 2-D rows
    gr = G * W // 128  # chunk in 2-D rows

    def kernel(starts_ref, in_hbm, out_hbm, scratch, in_sem, out_sems):
        t = pl.program_id(0)
        load = pltpu.make_async_copy(
            in_hbm.at[pl.ds(t * tr, tr), :], scratch, in_sem
        )
        load.start()
        load.wait()
        baser = pl.multiple_of(starts_ref[t] // 4, 8)  # record rows -> 2-D rows

        def chunk_copy(j):
            off = pl.multiple_of(baser + j * gr, 8)
            return pltpu.make_async_copy(
                scratch.at[pl.ds(j * gr, gr), :],
                out_hbm.at[pl.ds(off, gr), :],
                out_sems.at[j % 8],
            )

        for j in range(T // G):
            chunk_copy(j).start()
        for j in range(T // G):
            # one wait per issued copy, matching descriptor byte counts
            chunk_copy(j).wait()

    def fn(x, starts):
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(n // T,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=pl.BlockSpec(memory_space=pl.ANY),
                scratch_shapes=[
                    pltpu.VMEM((tr, 128), jnp.uint32),
                    pltpu.SemaphoreType.DMA,
                    pltpu.SemaphoreType.DMA((8,)),
                ],
            ),
            out_shape=jax.ShapeDtypeStruct((m, 128), jnp.uint32),
            interpret=interpret,
        )(starts, x)

    return fn


def main():
    n = N
    interpret = "--cpu" in sys.argv
    if interpret:
        jax.config.update("jax_platforms", "cpu")
        n = 1 << 14
    enable_persistent_cache(tag="cpu" if interpret else "tpu")
    m = n * W // 128
    x = jax.random.randint(
        jax.random.PRNGKey(0), (m, 128), 0, 1 << 30, dtype=jnp.uint32
    )
    starts = jnp.arange(n // T, dtype=jnp.int32) * T
    jax.block_until_ready((x, starts))
    print(f"device: {jax.devices()[0]}  N={n} T={T} W={W}", flush=True)

    for G in (32, 64, 128, 512, T):
        fn = make_kernel(G, n, interpret=interpret)
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
                lambda x, s, _f=fn: _f(x, s)[0, 0], (x, starts)
            )
        except Exception as e:  # noqa: BLE001 — probe tool: record and move on
            print(f"G={G:5d} FAILED: {str(e).splitlines()[0][:120]}", flush=True)
            continue
        ndma = (n // T) * (T // G)
        bw = 2 * n * W * 4 / per / 1e9
        print(
            f"G={G:5d}  {per*1e3:8.3f} ms  {bw:7.1f} GB/s  "
            f"{ndma} DMAs -> {per/ndma*1e9:7.1f} ns/DMA  compile={c:.0f}s",
            flush=True,
        )


if __name__ == "__main__":
    main()
