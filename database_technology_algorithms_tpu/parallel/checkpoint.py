"""Per-stage checkpointing for the distributed pipeline.

SURVEY.md §5 (checkpoint row): "each operator stage writes sharded
partitions … resume = skip completed stages."  The reference's computation
is resumable-by-design at phase granularity — every merge phase
materializes its full state as ``segment<N>.bin`` files
(``DatabaseProject.cpp:219-228,263-265``) and inputs are deleted only after
the consuming round completes.  Here the distributed plan's stage outputs
(row-sharded global arrays) checkpoint the same way: each PROCESS saves its
own addressable shards per stage (npz + meta), a manifest marks completed
stages after a cross-process barrier, and a resumed run rebuilds the global
arrays with ``jax.make_array_from_callback`` and skips straight to the
first incomplete stage.

Recovery contract (matches the failure-detection story in
``parallel/multihost.py``): a host death mid-run surfaces as a bounded-time
error; the re-run loads every stage the manifest marks done and re-executes
only the rest — instead of the whole step (VERDICT r3 missing #3).
"""

from __future__ import annotations

import json
import os
import pathlib

import numpy as np


def local_content_tag(arrays) -> str:
    """CRC over this process's addressable shards of the given arrays —
    the per-process input-content fingerprint (cheap relative to the
    checkpoint IO it guards)."""
    import zlib

    h = 0
    for arr in arrays:
        for s in sorted(
            arr.addressable_shards, key=lambda s: s.index[0].start or 0
        ):
            h = zlib.crc32(
                np.ascontiguousarray(np.asarray(s.data)).tobytes(), h
            )
    return f"{h:08x}"


class StageCheckpoints:
    """Sharded per-stage checkpoint store for one pipeline run.

    Layout: ``<dir>/manifest.json`` ({"done": [stage, ...]}, written by
    process 0 after all processes saved), ``<dir>/<stage>.p<pid>.npz``
    (this process's row-shard blocks) + ``.meta.json`` (global shapes,
    this process's row offset, replicated scalars).
    """

    def __init__(
        self,
        ckpt_dir: str,
        fingerprint: dict | None = None,
        local_tag: str = "",
    ):
        """``fingerprint`` identifies the RUN globally (input shapes,
        field, config knobs; identical on every process) and is pinned in
        the shared manifest; ``local_tag`` is a per-PROCESS content hash
        of this process's input shards, pinned in the per-process meta.
        Stages checkpointed under a different fingerprint OR content tag
        are ignored — a reused directory must never resume another run's
        intermediates, even for same-shaped different data (r4 review
        finding)."""
        import jax

        self.dir = pathlib.Path(ckpt_dir)
        self.dir.mkdir(parents=True, exist_ok=True)
        self.pid = jax.process_index()
        self.nproc = jax.process_count()
        self.manifest_path = self.dir / "manifest.json"
        self.fingerprint = fingerprint or {}
        self.local_tag = local_tag

    # ---- manifest --------------------------------------------------------

    def _manifest(self) -> dict:
        if self.manifest_path.exists():
            return json.loads(self.manifest_path.read_text())
        return {"done": [], "fingerprint": self.fingerprint}

    def _stage_done_local(self, stage: str) -> bool:
        m = self._manifest()
        if m.get("fingerprint") != self.fingerprint:
            return False  # stale checkpoints from a different run/config
        if stage not in m["done"]:
            return False
        meta_p = self.dir / f"{stage}.p{self.pid}.meta.json"
        if not (self.dir / f"{stage}.p{self.pid}.npz").exists():
            return False
        if not meta_p.exists():
            return False
        meta = json.loads(meta_p.read_text())
        # per-process input-content check: same shapes, different data
        # must recompute
        return meta.get("local_tag", "") == self.local_tag

    def stage_done(self, stage: str) -> bool:
        """Globally-agreed skip decision.

        The verdict gates skipping a COLLECTIVE stage program: if one
        process resumed while another recomputed, the recomputing side's
        all_to_all/psum would wait forever (r4 review).  Every process
        therefore all-gathers its local verdict and the stage counts as
        done only when ALL processes have it (any straggler forces a
        uniform recompute — correct, just slower)."""
        ok = self._stage_done_local(stage)
        if self.nproc > 1:
            from jax.experimental import multihost_utils

            oks = multihost_utils.process_allgather(
                np.asarray([1 if ok else 0], np.int32)
            )
            ok = bool(np.asarray(oks).min() == 1)
        return ok

    def _mark_done(self, stage: str) -> None:
        m = self._manifest()
        if m.get("fingerprint") != self.fingerprint:
            m = {"done": [], "fingerprint": self.fingerprint}
        if stage not in m["done"]:
            m["done"].append(stage)
        tmp = self.manifest_path.with_suffix(".tmp")
        tmp.write_text(json.dumps(m))
        os.replace(tmp, self.manifest_path)

    def _barrier(self, tag: str) -> None:
        """All processes reach here before process 0 marks the stage done."""
        import jax

        if self.nproc > 1:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices(f"stage_ckpt_{tag}")

    # ---- save / load -----------------------------------------------------

    def save_stage(
        self, stage: str, arrays: dict, scalars: dict | None = None
    ) -> None:
        """Save this process's shards of row-sharded global arrays (plus
        replicated host scalars in the meta)."""
        local: dict[str, np.ndarray] = {}
        meta: dict = {
            "shapes": {}, "dtypes": {}, "lo": {},
            "scalars": scalars or {}, "local_tag": self.local_tag,
        }
        for name, arr in arrays.items():
            shards = sorted(
                arr.addressable_shards,
                key=lambda s: s.index[0].start or 0,
            )
            lo = shards[0].index[0].start or 0
            # load_stage reconstructs this process's rows from ONE (lo,
            # length) range — a mesh whose device order gives this process
            # non-contiguous global row slices would make its resume slice
            # out of range, so refuse loudly at save time (r4 advice)
            pos = lo
            for s in shards:
                start = s.index[0].start or 0
                if start != pos:
                    raise ValueError(
                        f"save_stage({stage!r}): process {self.pid}'s shards "
                        f"of {name!r} are not one contiguous row range "
                        f"(expected start {pos}, got {start}); per-stage "
                        f"checkpointing requires a mesh whose device order "
                        f"tiles each process's rows contiguously"
                    )
                stop = s.index[0].stop
                pos = arr.shape[0] if stop is None else stop
            local[name] = np.concatenate(
                [np.asarray(s.data) for s in shards], axis=0
            )
            meta["shapes"][name] = list(arr.shape)
            meta["dtypes"][name] = str(local[name].dtype)
            meta["lo"][name] = int(lo)
        tmp = self.dir / f"{stage}.p{self.pid}.npz.tmp"
        with open(tmp, "wb") as f:
            np.savez(f, **local)
        os.replace(tmp, self.dir / f"{stage}.p{self.pid}.npz")
        (self.dir / f"{stage}.p{self.pid}.meta.json").write_text(
            json.dumps(meta)
        )
        self._barrier(stage)
        if self.pid == 0:
            self._mark_done(stage)
        self._barrier(stage + "_done")

    def load_stage(self, stage: str, mesh) -> dict:
        """Rebuild the stage's global arrays from this process's shards."""
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        meta = json.loads(
            (self.dir / f"{stage}.p{self.pid}.meta.json").read_text()
        )
        data = np.load(self.dir / f"{stage}.p{self.pid}.npz")
        sharding = NamedSharding(mesh, P(mesh.axis_names))
        out = {}
        for name, shape in meta["shapes"].items():
            a = data[name]
            lo = meta["lo"][name]

            def cb(idx, _a=a, _lo=lo):
                r = idx[0]
                sl = (slice(r.start - _lo, r.stop - _lo),) + tuple(idx[1:])
                return _a[sl]

            out[name] = jax.make_array_from_callback(
                tuple(shape), sharding, cb
            )
        return out

    def load_scalars(self, stage: str) -> dict:
        meta = json.loads(
            (self.dir / f"{stage}.p{self.pid}.meta.json").read_text()
        )
        return meta.get("scalars", {})

    def cleanup(self) -> None:
        for f in self.dir.glob("*.npz"):
            f.unlink()
        for f in self.dir.glob("*.meta.json"):
            f.unlink()
        if self.manifest_path.exists():
            self.manifest_path.unlink()


class InjectedStageFailure(SystemExit):
    """Fault injection: deliberate death after a named stage completes."""

    def __init__(self, stage: str):
        super().__init__(17)
        self.stage = stage
