"""Segmented scans — per-group reductions without gathers or scatters.

Groups are contiguous runs in sorted order (flag = True at each run start).
A "keep-last" associative scan propagates the run head's value to every row
of the run; min/sum variants reset at run starts.  All are O(N) VPU work —
the building blocks that let aggregation and join head-propagation avoid
the TPU's slow random memory ops entirely (see ops/movement.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def seg_carry(start_flags: jax.Array, vals: jax.Array) -> jax.Array:
    """vals[row] := vals at the start of row's run (keep-last propagation)."""

    def op(a, b):
        fa, va = a
        fb, vb = b
        return fa | fb, jnp.where(fb, vb, va)

    _, v = jax.lax.associative_scan(op, (start_flags, vals))
    return v


def seg_min(start_flags: jax.Array, vals: jax.Array) -> jax.Array:
    """Running min within each run (inclusive)."""

    def op(a, b):
        fa, va = a
        fb, vb = b
        return fa | fb, jnp.where(fb, vb, jnp.minimum(va, vb))

    _, v = jax.lax.associative_scan(op, (start_flags, vals))
    return v


def seg_max(start_flags: jax.Array, vals: jax.Array) -> jax.Array:
    """Running max within each run (inclusive)."""

    def op(a, b):
        fa, va = a
        fb, vb = b
        return fa | fb, jnp.where(fb, vb, jnp.maximum(va, vb))

    _, v = jax.lax.associative_scan(op, (start_flags, vals))
    return v
