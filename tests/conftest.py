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
# persistent compile cache, keyed per machine type: this container moves
# across heterogeneous hosts and cross-machine XLA:CPU AOT blobs mismatch
from database_technology_algorithms_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache(tag="cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
