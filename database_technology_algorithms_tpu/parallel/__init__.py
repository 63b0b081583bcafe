"""Distributed layer: device mesh, all-to-all shuffle, distributed operators."""

from .dist_ops import (
    DistTable,
    collect,
    dist_aggregate,
    dist_distinct,
    dist_hash_join,
    dist_sort,
    distribute,
)
from .mesh import SHARD_AXIS, make_host_chip_mesh, make_mesh, mesh_size

__all__ = [
    "DistTable",
    "distribute",
    "collect",
    "dist_distinct",
    "dist_hash_join",
    "dist_aggregate",
    "dist_sort",
    "make_mesh",
    "make_host_chip_mesh",
    "mesh_size",
    "SHARD_AXIS",
]
