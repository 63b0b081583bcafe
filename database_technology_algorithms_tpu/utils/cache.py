"""Persistent-compile-cache helpers.

This container migrates across heterogeneous x86 hosts; XLA:CPU AOT blobs
compiled on one machine type SIGILL/mismatch on another ("Target machine
feature +prefer-no-gather is not supported on the host machine").  Key the
cache directory by a CPU-feature fingerprint so each machine type gets its
own cache.  TPU executables get their own dir per device kind.
"""

from __future__ import annotations

import hashlib
import os
import pathlib


def machine_fingerprint() -> str:
    try:
        flags = ""
        for line in open("/proc/cpuinfo"):
            if line.startswith(("flags", "Features")):
                flags = line
                break
        return hashlib.md5(flags.encode()).hexdigest()[:10]
    except OSError:
        return "unknown"


def enable_persistent_cache(base: str | None = None, tag: str = "cpu") -> str:
    import jax

    base = base or os.path.join(os.path.dirname(__file__), "..", "..", "build")
    d = pathlib.Path(base) / f"jax_cache_{tag}_{machine_fingerprint()}"
    d.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(d))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return str(d)
