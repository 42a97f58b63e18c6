"""TRUE multi-process (multi-controller) training test.

Spawns 2 OS processes x 2 virtual CPU devices each, joined via
jax.distributed into a 4-device global runtime with a (data=2, model=2)
mesh, and asserts the training trajectory is identical to a single-process
4-device run of the same problem (the standard JAX multi-controller CPU
harness — SURVEY §4; the reference has no distributed layer at all,
ref Code/main.py:24-35).

This exercises exactly what a real pod slice needs: host-local batch
feeding (each process device_puts only its own shards), on-device
all-gather of the scanned metrics (device_get of non-addressable shards
would throw), and process-0-only checkpoint writes.
"""

import json
import os
import re
import socket
import subprocess
import sys

import pytest

WORKER = os.path.join(os.path.dirname(__file__), "mp_worker.py")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _clean_env():
    env = dict(os.environ)
    # the pytest session forces 8 virtual devices; workers set their own
    flags = env.get("XLA_FLAGS", "")
    flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "", flags)
    env["XLA_FLAGS"] = flags.strip()
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


def _run_worker(out, coord, nproc, pid, local_devices, env, logf):
    return subprocess.Popen(
        [sys.executable, WORKER, out, coord, str(nproc), str(pid),
         str(local_devices)],
        env=env, stdout=logf, stderr=subprocess.STDOUT, text=True)


def _wait_all(procs, logfs, timeout):
    """Wait for all workers; kill survivors if one hangs or fails (they
    synchronize via collectives — an orphan would block forever).  Worker
    stdout goes to files, not pipes: sequential pipe reads can deadlock
    when the other worker fills its pipe buffer."""
    try:
        for p in procs:
            p.wait(timeout=timeout)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.wait()
    logs = []
    for f in logfs:
        f.seek(0)
        logs.append(f.read())
        f.close()
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-3000:]}"


@pytest.mark.slow
def test_two_process_training_matches_single_process(tmp_path):
    env = _clean_env()
    # ---- 2 processes x 2 devices, one global 4-device mesh
    port = _free_port()
    out_mp = str(tmp_path / "mp")
    logfs = [open(tmp_path / f"worker{pid}.log", "w+") for pid in range(2)]
    procs = [_run_worker(out_mp, f"127.0.0.1:{port}", 2, pid, 2, env,
                         logfs[pid])
             for pid in range(2)]
    _wait_all(procs, logfs, timeout=600)

    # ---- single process, same 4-device global mesh
    out_sp = str(tmp_path / "sp")
    logf = open(tmp_path / "worker_sp.log", "w+")
    p = _run_worker(out_sp, "none", 1, 0, 4, env, logf)
    _wait_all([p], [logf], timeout=600)

    with open(out_mp + ".0") as f:
        mp0 = json.load(f)
    with open(out_mp + ".1") as f:
        mp1 = json.load(f)
    with open(out_sp + ".0") as f:
        sp = json.load(f)

    assert mp0["process_count"] == 2 and mp0["devices"] == 4
    # the 2 processes train over a MIXED (data=2, model=2) mesh: sharded
    # frozen tables fed host-locally, not just pure DP (VERDICT r2 #7)
    assert mp0["mesh"] == {"data": 2, "model": 2}
    assert sp["process_count"] == 1 and sp["devices"] == 4
    # both controllers observed the same run
    assert mp0 == mp1
    # multi-process trajectory == single-process trajectory (same global
    # SPMD program; tolerance for collective summation-order noise)
    for (a_bce, a_rec), (b_bce, b_rec) in zip(sp["hist"], mp0["hist"]):
        assert abs(a_bce - b_bce) < 1e-3, (sp["hist"], mp0["hist"])
        assert abs(a_rec - b_rec) < 1e-2, (sp["hist"], mp0["hist"])
    assert abs(sp["eval_bce"] - mp0["eval_bce"]) < 1e-3
    assert abs(sp["checksum"] - mp0["checksum"]) / sp["checksum"] < 1e-4
