#!/usr/bin/env python
"""Measure the candidate primitives for a faster record-permute engine.

The engine's one expensive stage is applying a known dense permutation to
35-word records (``ops/movement.py place35``: five 8-operand lax.sorts,
~17 ms per 1M rows).  Candidate replacements and what decides them:

  P1 replicated-key 2D sort    lax.sort((key[N,G], payload[N,G]))
                               — if XLA's sort network is lane-starved at
                               [N], wide columns ride free and 35 words
                               need ~ceil(35/G) sorts instead of 5.
                               Safe for unique keys only (stability).
  P2 one-hot matmul (bf16)     per-tile permutation as MXU work; rate
                               decides the 3-pass bucket-permute design.
  P3 one-hot matmul (int8)     same, int8 path (2x the bf16 rate if the
                               MXU int8 pipe is exposed).
  P4 pallas per-row VMEM store out[slot[j], :] = x[j, :] in a loop —
                               if ~few cycles/row, in-VMEM scatter is
                               viable and the bucket passes need no MXU.
  P5 pallas per-row VMEM load  out[j, :] = x[slot[j], :] (gather form).

DMA issue overhead is measured by tools/bench_pallas_dma.py.

Usage: python tools/bench_permute_prims.py [--cpu] [P1 P4 ...]
--cpu runs tiny shapes in interpreter mode (correctness only).
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from database_technology_algorithms_tpu.utils.cache import enable_persistent_cache
from database_technology_algorithms_tpu.utils.profiling import timed_steady

CPU = "--cpu" in sys.argv
N = 1 << 14 if CPU else 1 << 20
W = 36
T = 512 if CPU else 2048  # rows per pallas tile


def report(name, per_s, note=""):
    print(f"{name:28s} {per_s*1e3:9.3f} ms  {note}", flush=True)


# --- P1: replicated-key 2D sort --------------------------------------------


def p1():
    key = jax.random.permutation(jax.random.PRNGKey(0), N).astype(jnp.uint32)
    # (key-replica width, #payload operands): cost per 2D sort vs how many
    # payload words it moves (g*npay); place35 moves 35 words in ~17 ms
    for g, npay in ((4, 1), (8, 1), (8, 2), (16, 1), (16, 2), (32, 1)):
        k2 = jnp.broadcast_to(key[:, None], (N, g))
        pays = tuple(
            jax.random.randint(
                jax.random.PRNGKey(1 + i), (N, g), 0, 1 << 30, dtype=jnp.uint32
            )
            for i in range(npay)
        )

        def f(k2, *pays):
            out = jax.lax.sort((k2,) + pays, num_keys=1, dimension=0)
            return out[1:]

        if CPU:
            out = jax.jit(f)(k2, *pays)
            flat = jax.lax.sort((key, pays[0][:, 0]), num_keys=1)[1]
            ok = bool(jnp.all(out[0][:, 0] == flat))
            print(f"P1 g={g} npay={npay} interpret ok={ok}", flush=True)
            continue
        per, c = timed_steady(f, (k2,) + pays)
        moved = g * npay
        eq35 = per * np.ceil(35 / moved)
        report(
            f"P1 sort2d [N,{g}]x{npay}pay",
            per,
            f"-> 35 words = {eq35*1e3:.2f} ms (place35 ~17ms) compile={c:.0f}s",
        )


# --- P2/P3: one-hot matmul permute rate -------------------------------------


def p23(int8: bool):
    # per-tile: out[p] = x[slot==p]; batch of TB tiles at once
    TB = 4 if CPU else 64
    S = 2 * T  # padded output slots per tile
    C4 = W * 4  # u8 columns
    x = jax.random.randint(
        jax.random.PRNGKey(2), (TB, T, C4), 0, 255, dtype=jnp.int32
    ).astype(jnp.uint8)
    # slot[j] = unique position in [0, S)
    slot = jnp.stack(
        [
            jax.random.permutation(jax.random.PRNGKey(10 + b), S)[:T]
            for b in range(TB)
        ]
    ).astype(jnp.int32)

    def f(x, slot):
        oh = (
            slot[:, None, :] == jax.lax.broadcasted_iota(jnp.int32, (1, S, 1), 1)
        )  # [TB, S, T]
        if int8:
            ohm = oh.astype(jnp.int8)
            xm = x.astype(jnp.int8)
            y = jax.lax.dot_general(
                ohm,
                xm,
                (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.int32,
            )
            return (y & 0xFF).astype(jnp.uint8)
        ohm = oh.astype(jnp.bfloat16)
        xm = x.astype(jnp.bfloat16)
        y = jax.lax.dot_general(
            ohm,
            xm,
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        return y.astype(jnp.uint8)

    name = f"P{'3' if int8 else '2'} onehot-mm {'int8' if int8 else 'bf16'}"
    if CPU:
        out = np.asarray(jax.jit(f)(x, slot))
        ref = np.zeros_like(out)
        sl = np.asarray(slot)
        xs = np.asarray(x)
        for b in range(TB):
            ref[b, sl[b]] = xs[b]
        print(f"{name} ok={bool((out == ref).all())}", flush=True)
        return
    per, c = timed_steady(f, (x, slot))
    macs = TB * S * T * C4
    # full-pass cost: all N rows through tiles of T
    full = per * (N / (TB * T))
    report(
        name,
        per,
        f"{macs/per/1e12:.1f} Tmac/s -> full 1M-row pass = {full*1e3:.2f} ms compile={c:.0f}s",
    )


# --- P4/P5: pallas per-row dynamic VMEM store/load ---------------------------


def make_rowmove(load: bool, interpret: bool):
    # slot values arrive as a VMEM block and are DMA'd to SMEM scratch so
    # the per-row loop can read them as scalars (the whole-array scalar-
    # prefetch form exceeds the 1 MB SMEM budget at 1M rows)
    def kernel(slot_ref, x_ref, o_ref, smem, sem):
        cp = pltpu.make_async_copy(slot_ref, smem, sem)
        cp.start()
        cp.wait()

        def body(j, _):
            s = smem[0, j]
            if load:
                o_ref[pl.ds(j, 1), :] = x_ref[pl.ds(s, 1), :]
            else:
                o_ref[pl.ds(s, 1), :] = x_ref[pl.ds(j, 1), :]
            return 0

        jax.lax.fori_loop(0, x_ref.shape[0], body, 0)

    @jax.jit
    def f(x, slot):
        return pl.pallas_call(
            kernel,
            grid=(N // T,),
            in_specs=[
                pl.BlockSpec((1, T), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((T, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (T, W), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[
                pltpu.SMEM((1, T), jnp.int32),
                pltpu.SemaphoreType.DMA,
            ],
            out_shape=jax.ShapeDtypeStruct((N, W), jnp.uint32),
            interpret=interpret,
        )(slot[None, :], x)

    return f


def p45(load: bool):
    x = jax.random.randint(jax.random.PRNGKey(3), (N, W), 0, 1 << 30, dtype=jnp.uint32)
    # per-tile random permutation slots (tile-RELATIVE offsets), flattened;
    # each grid step receives its tile's slot block via a (1,T) VMEM
    # BlockSpec and DMAs it to SMEM for scalar reads
    rng = np.random.default_rng(0)
    slot = np.concatenate(
        [rng.permutation(T) for _ in range(N // T)]
    ).astype(np.int32)
    slot = jnp.asarray(slot)

    g = make_rowmove(load, interpret=CPU)

    name = f"P{'5' if load else '4'} pallas row-{'load' if load else 'store'}"
    if CPU:
        out = np.asarray(g(x, slot))
        xs = np.asarray(x).reshape(N // T, T, W)
        sl = np.asarray(slot).reshape(N // T, T)
        ref = np.zeros_like(xs)
        for t in range(N // T):
            if load:
                ref[t] = xs[t][sl[t]]
            else:
                ref[t][sl[t]] = xs[t]
        ok = bool((out.reshape(N // T, T, W) == ref).all())
        print(f"{name} ok={ok}", flush=True)
        return
    per, c = timed_steady(g, (x, slot))
    report(name, per, f"{per/N*1e9:.1f} ns/row compile={c:.0f}s")


def main():
    if CPU:
        jax.config.update("jax_platforms", "cpu")
    enable_persistent_cache(tag="cpu" if CPU else "tpu")
    print(f"device={jax.devices()[0]} N={N} T={T}", flush=True)
    which = [a for a in sys.argv[1:] if not a.startswith("--")] or [
        "P1",
        "P2",
        "P3",
        "P4",
        "P5",
    ]
    if "P1" in which:
        p1()
    if "P2" in which:
        p23(int8=False)
    if "P3" in which:
        p23(int8=True)
    if "P4" in which:
        p45(load=False)
    if "P5" in which:
        p45(load=True)


if __name__ == "__main__":
    main()
