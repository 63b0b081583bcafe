"""Segmented scans — per-group reductions without gathers or scatters.

Groups are contiguous runs in sorted order (flag = True at each run start).
A "keep-last" associative scan propagates the run head's value to every row
of the run; min/sum variants reset at run starts.  All are O(N) VPU work —
the building blocks that let aggregation and join head-propagation avoid
the TPU's slow random memory ops entirely (see ops/movement.py).

r3: scans are the pipeline's second-biggest cost after the view sort
(measured 2.6 ms per flat ``lax.associative_scan`` at 2M rows — ~21
full-array passes).  Every scan here therefore runs BLOCKED: reshape
[N] -> [R, C] row-major, an inclusive lane-axis scan in log2(C) shift+op
steps, a tiny flat scan over the R row-carries, then one broadcast
combine — ~log2(C)+2 full-size passes instead of ~log2(N), measured ~2x
faster at 2M rows and exact for any associative op (flags included:
the (flag, value) pairs of a segmented scan form an associative monoid
with identity (False, e)).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_LANES = 512  # block width: log2 steps on the lane axis, R=N/_LANES carries


def _blocked_scan(op, identity, xs: tuple):
    """Inclusive associative scan over tuple-elements, blocked layout.

    op: associative combine over tuples; identity: tuple of scalars with
    op(identity, x) == x.  Exact for any N (tail padded with identity).
    """
    n = xs[0].shape[0]
    c = _LANES
    if n <= 2 * c:
        return jax.lax.associative_scan(op, xs)
    r = -(-n // c)
    pad = r * c - n

    def to_blocks(x, e):
        full = jnp.concatenate(
            [x, jnp.full((pad,), e, x.dtype)]
        ) if pad else x
        return full.reshape(r, c)

    blocks = tuple(to_blocks(x, e) for x, e in zip(xs, identity))

    # lane-axis inclusive scan: log2(c) shift+combine steps
    d = 1
    while d < c:
        shifted = tuple(
            jnp.concatenate(
                [jnp.full((r, d), e, b.dtype), b[:, :-d]], axis=1
            )
            for b, e in zip(blocks, identity)
        )
        blocks = op(shifted, blocks)
        d *= 2

    # per-row totals -> exclusive carries via a small flat scan over R rows
    row_tot = tuple(b[:, -1] for b in blocks)
    row_incl = jax.lax.associative_scan(op, row_tot)
    row_excl = tuple(
        jnp.concatenate([jnp.full((1,), e, t.dtype), t[:-1]])
        for t, e in zip(row_incl, identity)
    )
    out = op(tuple(t[:, None] for t in row_excl), blocks)
    return tuple(o.reshape(r * c)[:n] for o in out)


def _seg_op(inner):
    """Lift a plain associative op to the (flag, value) segmented monoid."""

    def op(a, b):
        fa, va = a
        fb, vb = b
        return fa | fb, jnp.where(fb, vb, inner(va, vb))

    return op


def seg_carry(start_flags: jax.Array, vals: jax.Array) -> jax.Array:
    """vals[row] := vals at the start of row's run (keep-last propagation).

    Only flagged positions' values are read (as before); internally the
    carry rides an ADD monoid over start-masked values — a flagless
    partial aggregate is always 0, so (False, 0) is a true identity and
    the blocked scan applies (keep-left alone has no identity element).
    """
    masked = jnp.where(start_flags, vals, jnp.zeros((), vals.dtype))
    _, v = _blocked_scan(
        _seg_op(lambda va, vb: va + vb),
        (False, jnp.zeros((), vals.dtype)),
        (start_flags, masked),
    )
    return v


def seg_min(start_flags: jax.Array, vals: jax.Array) -> jax.Array:
    """Running min within each run (inclusive)."""
    maxv = (
        jnp.iinfo(vals.dtype).max
        if jnp.issubdtype(vals.dtype, jnp.integer)
        else jnp.inf
    )
    _, v = _blocked_scan(
        _seg_op(jnp.minimum),
        (False, jnp.asarray(maxv, vals.dtype)),
        (start_flags, vals),
    )
    return v


def seg_max(start_flags: jax.Array, vals: jax.Array) -> jax.Array:
    """Running max within each run (inclusive)."""
    minv = (
        jnp.iinfo(vals.dtype).min
        if jnp.issubdtype(vals.dtype, jnp.integer)
        else -jnp.inf
    )
    _, v = _blocked_scan(
        _seg_op(jnp.maximum),
        (False, jnp.asarray(minv, vals.dtype)),
        (start_flags, vals),
    )
    return v


def cumsum(vals: jax.Array) -> jax.Array:
    """Inclusive prefix sum, blocked (drop-in for jnp.cumsum on 1-D)."""
    (v,) = _blocked_scan(
        lambda a, b: (a[0] + b[0],),
        (jnp.zeros((), vals.dtype),),
        (vals,),
    )
    return v
