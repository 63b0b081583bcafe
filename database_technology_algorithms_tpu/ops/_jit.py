"""Per-static-value jit dispatch with corruption recovery.

This image's (patched) jax build has an executable-dispatch defect: once
several structurally-similar programs are compiled, re-calling an earlier
(static-args, shapes) combination can invoke the WRONG executable —
``Executable expected parameter 0 of size 4 but got buffer ...`` — raised
straight from the C++ dispatch with no Python frames.  Minimal repro:
merge_join over fields "0","1","2" then "1" again; field "1" keeps failing
while "0"/"2"/"3" recalls succeed.  Neither separate jax.jit objects per
static tuple, unique module names, nor AOT lower().compile() avoid it, but
clearing the affected function's cache and recompiling recovers — i.e. the
executables are fine, the dispatch table is corrupted.

Strategy here: keep one jit object per static tuple (correct + fast), detect
the corruption signature at call time, and recover by rebuilding the jit
object (then, if needed, ``jax.clear_caches()``) and retrying.  Recovery
costs a recompile; corruption is rare and correctness is never affected
(the bad dispatch raises, it does not silently misbehave — parameter shapes
mismatch).
"""

from __future__ import annotations

import functools
import inspect

import jax

_CORRUPTION_MARKERS = (
    "Executable expected parameter",
    "Computation compiled for",
)


def _is_corrupted_dispatch(e: Exception) -> bool:
    s = str(e)
    return any(m in s for m in _CORRUPTION_MARKERS)


def per_static_jit(impl, static_names: tuple[str, ...] = ("field", "cfg")):
    sig = inspect.signature(impl)
    dyn_names = [n for n in sig.parameters if n not in static_names]
    cache: dict = {}
    salt = [0]

    def _build(statics):
        s_map = dict(zip(static_names, statics))

        def g(*dyn_args, _s_map=s_map):
            kw = dict(zip(dyn_names, dyn_args))
            kw.update(_s_map)
            return impl(**kw)

        salt[0] += 1
        g.__name__ = f"{impl.__name__}_s{salt[0]}"
        return jax.jit(g)

    @functools.wraps(impl)
    def wrapper(*args, **kwargs):
        b = sig.bind_partial(*args, **kwargs)
        b.apply_defaults()
        statics = tuple(b.arguments.get(n) for n in static_names)
        dyn = tuple(b.arguments.get(n) for n in dyn_names)
        fn = cache.get(statics)
        if fn is None:
            fn = cache[statics] = _build(statics)
        try:
            return fn(*dyn)
        except ValueError as e:
            if not _is_corrupted_dispatch(e):
                raise
        # corrupted dispatch: rebuild this static combo's jit and retry
        fn = cache[statics] = _build(statics)
        try:
            return fn(*dyn)
        except ValueError as e:
            if not _is_corrupted_dispatch(e):
                raise
        # still corrupted: nuke every jax-level cache and retry once more
        jax.clear_caches()
        cache.clear()
        fn = cache[statics] = _build(statics)
        return fn(*dyn)

    wrapper.clear_cache = cache.clear  # type: ignore[attr-defined]
    return wrapper


def call_resilient(build_fn, *args):
    """Build a jitted callable and invoke it, recovering from corrupted
    dispatch (see module docstring) by rebuilding / clearing caches."""
    fn = build_fn()
    try:
        return fn(*args)
    except ValueError as e:
        if not _is_corrupted_dispatch(e):
            raise
    fn = build_fn()
    try:
        return fn(*args)
    except ValueError as e:
        if not _is_corrupted_dispatch(e):
            raise
    jax.clear_caches()
    return build_fn()(*args)


def resilient_jit(build_fn):
    """Persistent resilient wrapper around build_fn() -> jitted callable.

    The returned callable exposes ``.build_fn`` so tools can lower the
    underlying jitted program (HLO inspection, AOT warming)."""
    holder = [None]

    def call(*args, **kwargs):
        if holder[0] is None:
            holder[0] = build_fn()
        try:
            return holder[0](*args, **kwargs)
        except ValueError as e:
            if not _is_corrupted_dispatch(e):
                raise
        holder[0] = build_fn()
        try:
            return holder[0](*args, **kwargs)
        except ValueError as e:
            if not _is_corrupted_dispatch(e):
                raise
        jax.clear_caches()
        holder[0] = build_fn()
        return holder[0](*args, **kwargs)

    call.build_fn = build_fn  # type: ignore[attr-defined]
    return call
