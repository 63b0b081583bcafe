"""Device mesh helpers.

The engine's only parallel axis is data partitioning: tables are sharded by
row across chips (SURVEY.md §2.3 — the reference has no parallelism at all,
so this layer is new capability whose *semantics* contract is that every
distributed operator returns the same row multisets as its single-chip
form).  A 1-D ``('shard',)`` mesh covers single-host; multi-host pods reshape
to ``('host', 'chip')`` with the host axis on DCN — XLA picks the transport
per axis, the operator code is identical.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

SHARD_AXIS = "shard"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (SHARD_AXIS,))


def make_host_chip_mesh(n_hosts: int, chips_per_host: int) -> Mesh:
    """2-D mesh for multi-host pods: DCN on 'host', ICI on 'chip'.

    Operators address the flattened ('host','chip') pair as one logical
    shard axis via shard_map over both names.
    """
    devices = np.asarray(jax.devices()[: n_hosts * chips_per_host]).reshape(
        n_hosts, chips_per_host
    )
    return Mesh(devices, ("host", "chip"))


def row_sharding(mesh: Mesh) -> NamedSharding:
    """Rows split across all mesh axes; trailing dims replicated."""
    return NamedSharding(mesh, P(mesh.axis_names))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def mesh_size(mesh: Mesh) -> int:
    return int(np.prod(list(mesh.shape.values())))
