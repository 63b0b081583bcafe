#!/usr/bin/env python
"""Critical measurement: wide-payload lax.sort + cumsum costs at 1M rows."""
import os
import sys
import time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from database_technology_algorithms_tpu.utils.cache import enable_persistent_cache
enable_persistent_cache(tag="tpu")

N = 1_000_000
def timeit(name, fn, *args, reps=3):
    f = jax.jit(fn)
    t0=time.perf_counter(); out=f(*args); jax.block_until_ready(out)
    c=time.perf_counter()-t0
    best=1e9
    for _ in range(reps):
        t0=time.perf_counter(); out=f(*args); jax.block_until_ready(out)
        best=min(best,time.perf_counter()-t0)
    print(f"{name:44s} {best*1e3:9.2f} ms (compile {c:.1f}s)", flush=True)

k = jax.random.randint(jax.random.PRNGKey(0), (N,), 0, 300000, dtype=jnp.uint32)
pay = [jax.random.randint(jax.random.PRNGKey(i), (N,), 0, 1<<30, dtype=jnp.uint32) for i in range(1, 37)]
iota = jnp.arange(N, dtype=jnp.int32)

timeit("sort key + 3 payload ops", lambda k,*p: jax.lax.sort((k,)+p, num_keys=1), k, *pay[:3])
timeit("sort key + 9 payload ops", lambda k,*p: jax.lax.sort((k,)+p, num_keys=1), k, *pay[:9])
timeit("sort key + 35 payload ops", lambda k,*p: jax.lax.sort((k,)+p, num_keys=1), k, *pay[:35])
timeit("cumsum i32", lambda x: jnp.cumsum(x), pay[0].astype(jnp.int32))
m = k < 150000
timeit("sort 2keys(mask,iota)+35pay", lambda m,i,*p: jax.lax.sort((m.astype(jnp.uint32),i)+p, num_keys=2), m, iota, *pay[:35])
# strs pack/unpack cost
strs = jax.random.randint(jax.random.PRNGKey(99), (N,128), 0, 255, dtype=jnp.uint8)
def pack(s):
    w = s.astype(jnp.uint32).reshape(N, 32, 4)
    return (w[...,0]<<24)|(w[...,1]<<16)|(w[...,2]<<8)|w[...,3]
timeit("pack u8[N,128] -> u32[N,32]", pack, strs)
w32 = pack(strs)
def unpack(w):
    b = jnp.stack([(w>>24)&0xFF,(w>>16)&0xFF,(w>>8)&0xFF,w&0xFF], axis=-1)
    return b.astype(jnp.uint8).reshape(N,128)
timeit("unpack back", unpack, w32)
# searchsorted cost for comparison
sk = jnp.sort(k)
timeit("searchsorted 1M in 1M", lambda a,q: jnp.searchsorted(a,q), sk, k)
