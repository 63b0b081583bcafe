"""Multi-host (multi-process) runtime entry — the DCN code path.

The reference is strictly single-process (SURVEY.md §2.3: no threads, no
processes, no network; its only data plane is segment files on local disk).
The engine's multi-host form follows the standard JAX recipe: every process
calls :func:`initialize` (coordinator rendezvous), builds one global
``Mesh`` over ``jax.devices()`` (all processes' devices), creates global
row-sharded arrays with ``jax.make_array_from_callback``, and runs the very
same ``jit(shard_map(...))`` pipeline step — XLA routes the axis-crossing
collectives over ICI within a host and DCN across hosts.

CI has one host, so the multi-process tests launch N separate CPU processes
(gloo collectives, ``jax_num_cpu_devices`` local devices each) against a
localhost coordinator — the same code path a real pod takes, minus the
physical DCN (SURVEY.md §4c).
"""

from __future__ import annotations

import numpy as np

from ..batch import pack_str_bytes


def initialize(
    coordinator: str,
    num_processes: int,
    process_id: int,
    local_devices: int | None = None,
    platform: str | None = None,
    initialization_timeout: int = 300,
    heartbeat_timeout: int = 100,
) -> None:
    """Join the distributed runtime. Must run before any other jax use.

    platform="cpu" also selects gloo CPU collectives (the multi-process CPU
    backend used by tests); local_devices forces the per-process device
    count (CPU only).  Failure detection (SURVEY.md §5): a host that never
    joins fails rendezvous after `initialization_timeout` seconds; a host
    that dies mid-run is detected by the coordination service's heartbeat
    after `heartbeat_timeout` seconds — both surface as raised errors, and
    recovery is re-running the failed stage (batch engine; stage outputs
    are materialized partitions, external.py manifests resume).
    """
    import jax

    if platform:
        jax.config.update("jax_platforms", platform)
    if platform == "cpu":
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    if local_devices is not None:
        jax.config.update("jax_num_cpu_devices", local_devices)
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
        initialization_timeout=initialization_timeout,
        heartbeat_timeout_seconds=heartbeat_timeout,
    )


def pad_columns(cols: dict, ndev: int, per: int) -> tuple[dict, np.ndarray]:
    """Block-partition host columns: chip d's live rows at [d*per, d*per+c_d).

    Returns (padded columns incl. packed strw, per-chip live counts)."""
    n = len(cols["recid"])
    counts = np.minimum(np.maximum(n - per * np.arange(ndev), 0), per).astype(
        np.int32
    )

    def pad(a):
        out = np.zeros((ndev * per,) + a.shape[1:], dtype=a.dtype)
        off = 0
        for d in range(ndev):
            c = counts[d]
            out[d * per : d * per + c] = a[off : off + c]
            off += c
        return out

    valid = cols.get("valid")
    if valid is None:
        valid = np.ones(n, dtype=bool)
    # narrow-width storage: width derives from the (identical-on-every-
    # process) column content, so the global array shape is agreed without
    # any extra cross-host negotiation
    from ..batch import narrow_str_bytes

    strs = narrow_str_bytes(np.asarray(cols["strs"], np.uint8))
    padded = {
        "recid": pad(np.asarray(cols["recid"], np.uint32)),
        "num": pad(np.asarray(cols["num"], np.uint32)),
        "strw": pad(pack_str_bytes(strs)),
        "valid": pad(np.asarray(valid, bool)),
    }
    return padded, counts


def distribute_global(mesh, cols: dict, rows_per_chip: int | None = None):
    """Multi-process form of ``dist_ops.distribute``: build GLOBAL arrays.

    Every process must pass identical ``cols``; each materializes only its
    addressable shards (``jax.make_array_from_callback``).  Works in
    single-process meshes too (then it equals ``distribute``).
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from .dist_ops import DistTable
    from .mesh import mesh_size
    from ..batch import RecordBatch

    ndev = mesh_size(mesh)
    n = len(cols["recid"])
    per = rows_per_chip or -(-n // ndev)
    padded, counts = pad_columns(cols, ndev, per)
    sharding = NamedSharding(mesh, P(mesh.axis_names))

    def mk(a):
        return jax.make_array_from_callback(
            a.shape, sharding, lambda idx, _a=a: _a[idx]
        )

    batch = RecordBatch(
        recid=mk(padded["recid"]),
        num=mk(padded["num"]),
        strw=mk(padded["strw"]),
        valid=mk(padded["valid"]),
    )
    return DistTable(batch=batch, count=mk(counts))
