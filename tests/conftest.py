"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; per SURVEY.md §4 the distributed
tests exercise the same pjit/shard_map code path on XLA's forced-host-device
backend instead.

Note: this image pre-imports jax and registers the TPU backend in
sitecustomize before conftest runs, so JAX_PLATFORMS env vars are too late —
we must flip the already-imported config.  XLA_FLAGS still works because the
CPU backend initializes lazily.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: the exact string-sort fallback branches are
# expensive to compile; cache them across test runs
_cache_dir = os.path.join(os.path.dirname(__file__), "..", "build", "jax_cache")
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
