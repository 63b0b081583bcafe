#!/usr/bin/env python
"""Piecewise profile of the over-budget tiled join (r5): staging vs
member-kernel scan vs the probe-order return, each as its own fenced
jitted program, to find where the 14x-over-model wall time lives."""
import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

import jax
import jax.numpy as jnp

from database_technology_algorithms_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache(tag="tpu" if "--cpu" not in sys.argv else "cpu")
if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

from database_technology_algorithms_tpu.config import EngineConfig
from database_technology_algorithms_tpu.io.device_gen import generate_device_batch
from database_technology_algorithms_tpu.ops.hash_join import member_multiplicity
from database_technology_algorithms_tpu.ops.keys import key_hash, key_words
from database_technology_algorithms_tpu.ops.movement import stage_to_cells
from database_technology_algorithms_tpu.utils.profiling import timed_steady

ROWS = 1_000_000
MEM = 512 * 1024


def main():
    k1, k2 = jax.random.split(jax.random.PRNGKey(42))
    r = generate_device_batch(k1, ROWS, key_range=max(3 * ROWS // 10, 1))
    s = generate_device_batch(k2, ROWS, key_range=max(3 * ROWS // 10, 1))
    jax.block_until_ready((r, s))

    nb = npr = ROWS
    from database_technology_algorithms_tpu.ops.hash_join import _tile_layout

    ntiles, cap_b, cap_p, group = _tile_layout(nb, npr, MEM)
    print(f"ntiles={ntiles} cap_b={cap_b} cap_p={cap_p} group={group} "
          f"steps={ntiles//group}", flush=True)

    def cs(arrs):
        tot = jnp.uint32(0)
        for a in jax.tree_util.tree_leaves(arrs):
            tot = tot + jnp.sum(a.astype(jnp.uint32))
        return tot

    def stage_build(key_b):
        hb = key_hash(r, 1) % jnp.uint32(ntiles)
        act = jnp.ones(nb, bool)
        cells, cnt, slot, ovf = stage_to_cells(hb, act, ntiles, cap_b,
                                               [key_b])
        return cs(cells) + cs([cnt, slot]) + ovf.astype(jnp.uint32)

    per, c = timed_steady(stage_build, (r.num,), k=4)
    print(f"stage_to_cells one side     {per*1e3:8.2f} ms (compile {c:.0f}s)",
          flush=True)

    # staged inputs for the scan-only measurement
    hb = key_hash(r, 1) % jnp.uint32(ntiles)
    hp = key_hash(s, 1) % jnp.uint32(ntiles)
    act = jnp.ones(ROWS, bool)
    bcells, bcnt, _, _ = stage_to_cells(hb, act, ntiles, cap_b, [r.num])
    pcells, pcnt, slot_p, _ = stage_to_cells(hp, act, ntiles, cap_p, [s.num])
    jax.block_until_ready((bcells, pcells, bcnt, pcnt))
    nsteps = ntiles // group

    def scan_only(bw, pw, bc, pc):
        xs = (
            (bw.reshape(nsteps, group, cap_b),),
            (pw.reshape(nsteps, group, cap_p),),
            bc.reshape(nsteps, group),
            pc.reshape(nsteps, group),
        )

        def one_pair(bw_, pw_, cb_, cp_):
            live = jnp.arange(cap_p, dtype=jnp.int32) < cp_
            return member_multiplicity(list(bw_), cb_, list(pw_), live)

        bp = jax.vmap(one_pair)

        def body(carry, x):
            return carry, bp(*x)

        _, mult = jax.lax.scan(body, jnp.int32(0), xs)
        return cs([mult])

    per, c = timed_steady(
        scan_only, (bcells[0], pcells[0], bcnt, pcnt), k=4
    )
    print(f"member scan ({nsteps} steps)    {per*1e3:8.2f} ms (compile {c:.0f}s)",
          flush=True)

    def one_step(bw, pw, bc, pc):
        def one_pair(bw_, pw_, cb_, cp_):
            live = jnp.arange(cap_p, dtype=jnp.int32) < cp_
            return member_multiplicity(list(bw_), cb_, list(pw_), live)

        return cs([jax.vmap(one_pair)(
            (bw.reshape(nsteps, group, cap_b)[0],),
            (pw.reshape(nsteps, group, cap_p)[0],),
            bc.reshape(nsteps, group)[0],
            pc.reshape(nsteps, group)[0],
        )])

    per, c = timed_steady(one_step, (bcells[0], pcells[0], bcnt, pcnt), k=4)
    print(f"ONE member step (G={group})     {per*1e3:8.2f} ms (compile {c:.0f}s)",
          flush=True)

    def ret_only(slot_p):
        mult_flat = jnp.zeros(ntiles * cap_p + 1, jnp.uint32)
        return cs([jnp.take(mult_flat, jnp.minimum(slot_p, ntiles * cap_p))])

    per, c = timed_steady(ret_only, (slot_p,), k=4)
    print(f"probe-order return gather   {per*1e3:8.2f} ms (compile {c:.0f}s)",
          flush=True)


if __name__ == "__main__":
    main()
