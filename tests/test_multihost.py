"""True multi-process (multi-host) runtime tests.

SURVEY.md §4c / §7 M4: the distributed pipeline must run through
``jax.distributed.initialize`` across SEPARATE processes — the same code
path a real multi-host pod takes over DCN — not just the in-process
forced-host-device simulation.  These tests launch N python processes
against a localhost coordinator (gloo CPU collectives, 4 local devices
each) via the CLI's --coordinator/--num-processes/--process-id flags and
assert both exit 0 with identical, single-process-matching counters.
"""

import json
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _launch(port, nproc, pid, nblocks, field, extra=()):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    return subprocess.Popen(
        [
            sys.executable, "-m", "database_technology_algorithms_tpu",
            "pipeline", "--nblocks", str(nblocks), "--field", str(field),
            "--skip-files", "--platform", "cpu",
            "--coordinator", f"localhost:{port}",
            "--num-processes", str(nproc), "--process-id", str(pid),
            "--local-devices", "4", *extra,
        ],
        env=env,
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        text=True,
        cwd=REPO,
    )


def _last_json(out: str) -> dict:
    for line in reversed(out.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise AssertionError(f"no JSON line in output:\n{out}")


@pytest.mark.parametrize("field", [1])
def test_two_process_pipeline_matches_single(field):
    from database_technology_algorithms_tpu.io.generator import generate_batch
    from database_technology_algorithms_tpu.models.pipeline import pipeline_single

    nblocks = 10
    port = _free_port()
    procs = [_launch(port, 2, pid, nblocks, field) for pid in (0, 1)]
    outs = []
    for p in procs:
        stdout, stderr = p.communicate(timeout=600)
        assert p.returncode == 0, f"rc={p.returncode}\n{stdout}\n{stderr}"
        outs.append(_last_json(stdout))

    # both processes observed identical global counters
    for k in ("merge_join_pairs", "hash_join_pairs", "nunique_r", "nunique_s"):
        assert outs[0][k] == outs[1][k], k
    assert outs[0]["joins_agree"] and outs[0]["overflow"] == 0
    assert outs[0]["mesh_devices"] == 8

    # and they match the single-process single-chip pipeline exactly
    r = generate_batch(nblocks, seed=42)
    s = generate_batch(nblocks, seed=43)
    ref = pipeline_single(r, s, field)
    assert outs[0]["merge_join_pairs"] == int(ref["merge_nres"])
    assert outs[0]["hash_join_pairs"] == int(ref["hash_nres"])
    assert outs[0]["nunique_r"] == int(ref["nunique_r"])
    assert outs[0]["nunique_s"] == int(ref["nunique_s"])


def test_missing_host_detected_at_rendezvous():
    """Failure detection (SURVEY.md §5): a 2-process run where host 1 never
    joins must FAIL host 0's rendezvous within the timeout — a clean raised
    error, not a hang (the reference has no failure policy at all)."""
    import time

    port = _free_port()
    t0 = time.time()
    p0 = _launch(port, 2, 0, 5, 1, extra=("--init-timeout", "12"))
    stdout, stderr = p0.communicate(timeout=120)
    assert p0.returncode != 0
    assert time.time() - t0 < 110
    assert "imeout" in (stdout + stderr) or "DEADLINE" in (stdout + stderr).upper()


def test_host_killed_midrun_detected_and_rerun_succeeds():
    """Fault injection (SURVEY.md §5, VERDICT r2 #5): SIGKILL process 1
    AFTER rendezvous (mid-run), assert process 0 surfaces the failure as a
    bounded-time error — not a hang — then re-run the stage to completion.
    The engine's recovery unit is the stage (batch engine): materialized
    stage state resumes via manifests (test_external_sort_resume covers the
    manifest skip; here the failed pipeline stage re-runs cleanly)."""
    import signal
    import time

    port = _free_port()
    hb = ("--heartbeat-timeout", "10")
    p0 = _launch(port, 2, 0, 8, 1, extra=hb)
    p1 = _launch(port, 2, 1, 8, 1, extra=hb)
    # wait for process 1 to pass rendezvous (marker on stderr), then kill it
    deadline = time.time() + 120
    joined = False
    for line in p1.stderr:
        if "rendezvous complete" in line:
            joined = True
            break
        if time.time() > deadline:
            break
    assert joined, "process 1 never reached rendezvous"
    os.kill(p1.pid, signal.SIGKILL)
    p1.wait(timeout=30)

    t0 = time.time()
    stdout, stderr = p0.communicate(timeout=180)
    detect_s = time.time() - t0
    assert p0.returncode != 0, f"survivor must fail loudly\n{stdout}\n{stderr}"
    # bounded-time detection: heartbeat timeout (10s) + slack, not the
    # 600s collective default
    assert detect_s < 150, f"detection took {detect_s:.0f}s"

    # recovery: re-run the failed stage from scratch — completes and agrees
    port2 = _free_port()
    procs = [_launch(port2, 2, pid, 8, 1) for pid in (0, 1)]
    outs = []
    for p in procs:
        stdout, stderr = p.communicate(timeout=600)
        assert p.returncode == 0, f"rc={p.returncode}\n{stdout}\n{stderr}"
        outs.append(_last_json(stdout))
    assert outs[0]["joins_agree"] and outs[0]["overflow"] == 0
    assert outs[0]["merge_join_pairs"] == outs[1]["merge_join_pairs"]


def test_two_process_stage_checkpoint_resume(tmp_path):
    """Per-stage checkpoint/resume across REAL processes (SURVEY §5
    checkpoint row, VERDICT r3 missing #3): both processes die (injected,
    exit 17) right after the 'local' stage checkpoints its sharded
    partitions; the re-run must LOAD that stage from the manifest
    (resumed_stages proves the skip) and produce the single-chip result."""
    from database_technology_algorithms_tpu.io.generator import generate_batch
    from database_technology_algorithms_tpu.models.pipeline import pipeline_single

    nblocks = 8
    ck = str(tmp_path / "stages")
    port = _free_port()
    extra = ("--stage-checkpoints", ck, "--fail-after-stage", "local")
    procs = [_launch(port, 2, pid, nblocks, 1, extra=extra) for pid in (0, 1)]
    for p in procs:
        stdout, stderr = p.communicate(timeout=600)
        assert p.returncode == 17, (
            f"expected injected death rc=17, got {p.returncode}\n{stdout}\n{stderr}"
        )
    # both processes' shards + the manifest survived the deaths
    import os as _os

    assert _os.path.exists(_os.path.join(ck, "manifest.json"))
    assert _os.path.exists(_os.path.join(ck, "local.p0.npz"))
    assert _os.path.exists(_os.path.join(ck, "local.p1.npz"))

    port2 = _free_port()
    procs = [
        _launch(port2, 2, pid, nblocks, 1, extra=("--stage-checkpoints", ck))
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        stdout, stderr = p.communicate(timeout=600)
        assert p.returncode == 0, f"rc={p.returncode}\n{stdout}\n{stderr}"
        outs.append(_last_json(stdout))
    for o in outs:
        assert o["resumed_stages"] == ["local"], o
        assert o["joins_agree"] and o["overflow"] == 0
    r = generate_batch(nblocks, seed=42)
    s = generate_batch(nblocks, seed=43)
    ref = pipeline_single(r, s, 1)
    assert outs[0]["merge_join_pairs"] == int(ref["merge_nres"])
    assert outs[0]["nunique_r"] == int(ref["nunique_r"])
