#!/usr/bin/env python
"""Wall-clock of the over-budget tiled join vs the in-budget kernel
(VERDICT r4 #6 done-criterion: an over-budget join at >= 4x mem_rows
within ~2x the in-budget rate).

The host-level driver must read the overflow scalar each call (the
capacity-retry gate), so every over-budget call carries one synchronous
device->host round trip — ~26 ms through this axon tunnel, ~0.1 ms on
locally-attached hardware.  Both the raw wall and the tunnel-corrected
compute estimate (wall minus a measured null round trip) are reported;
the production-relevant number is the corrected one.
"""
import os
import sys
import time

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
from database_technology_algorithms_tpu.ops.hash_join import hash_join_count
from database_technology_algorithms_tpu.utils.profiling import fence

ROWS = 1_000_000 if "--rows" not in sys.argv else int(
    sys.argv[sys.argv.index("--rows") + 1]
)


def main():
    k1, k2 = jax.random.split(jax.random.PRNGKey(42))
    r = generate_device_batch(k1, ROWS, key_range=max(3 * ROWS // 10, 1))
    s = generate_device_batch(k2, ROWS, key_range=max(3 * ROWS // 10, 1))
    jax.block_until_ready((r, s))

    # null round trip: the tunnel's fixed per-sync cost
    ready = jnp.zeros(())
    fence(ready)
    nulls = []
    for _ in range(8):
        t0 = time.perf_counter()
        fence(ready)
        nulls.append(time.perf_counter() - t0)
    null = min(nulls)
    print(f"null sync round trip: {null*1e3:.1f} ms", flush=True)

    def bench(name, cfg, nsyncs, reps=6):
        """``nsyncs``: host round trips per call — 1 in-budget (the
        result fence), 2 over-budget (the driver's overflow readback +
        the result fence).  compute = wall - nsyncs * null; production
        over-budget cost = compute + 1 RT (the overflow gate), which is
        ~0.1 ms on locally-attached hardware vs ~25 ms via this tunnel."""
        t0 = time.perf_counter()
        m, mu, nres = hash_join_count(r, s, 1, cfg)
        fence((m, nres))
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            m, mu, nres = hash_join_count(r, s, 1, cfg)
            fence((m, nres))
            best = min(best, time.perf_counter() - t0)
        corrected = max(best - nsyncs * null, 0.0)
        print(
            f"{name:34s} wall {best*1e3:8.2f} ms   "
            f"compute~{corrected*1e3:8.2f} ms   nres={int(nres)}   "
            f"(compile {compile_s:.1f}s)",
            flush=True,
        )
        return corrected, int(nres)

    in_budget, n1 = bench(
        "in-budget (mem_rows=16M)", EngineConfig(), nsyncs=1
    )
    over4, n2 = bench(
        "over-budget 4x (mem_rows=512K)",
        EngineConfig(mem_rows=512 * 1024), nsyncs=2,
    )
    assert n1 == n2, (n1, n2)
    print(
        f"\nover-budget/in-budget compute ratio: {over4/in_budget:.2f}x "
        f"(target ~<=2x, VERDICT r4 #6)"
    )


if __name__ == "__main__":
    main()
