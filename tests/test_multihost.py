"""Two-process virtual multi-host hac (VERDICT r2 item 4): launch two
local processes rendezvousing via jax.distributed on a localhost
coordinator, 4 virtual CPU devices each (8 global), and assert the full
distributed surface actually works — disjoint per-process data shards,
global-batch train steps with replicated params staying identical on
both hosts, process-0-only checkpoint writes, and a multi-writer orbax
sharded save that restores correctly (the real counterpart of
ha/attention_loop.py:67-80, not its single-process shadow)."""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path


def free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_hac(tmp_path):
    port = free_port()
    child = Path(__file__).parent / "multihost_child.py"
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update({
            "JAX_PLATFORMS": "cpu",
            "PALLAS_AXON_POOL_IPS": "",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
            "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
            "JAX_NUM_PROCESSES": "2",
            "JAX_PROCESS_ID": str(pid),
        })
        procs.append(subprocess.Popen(
            [sys.executable, str(child), str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True))
    outs = [p.communicate(timeout=600) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, f"child failed:\n{out}\n{err[-3000:]}"
        assert "CHILD-OK" in out

    r0 = json.loads((tmp_path / "report_0.json").read_text())
    r1 = json.loads((tmp_path / "report_1.json").read_text())

    # both saw the global topology
    for r in (r0, r1):
        assert r["pc"] == 2 and r["global_devices"] == 8
        assert r["local_devices"] == 4

    # per-process dataset shards are disjoint and cover the set
    i0, i1 = set(r0["indices"]), set(r1["indices"])
    assert not (i0 & i1), (i0, i1)
    assert i0 | i1 == set(range(16))

    # the global step produced identical replicated params on each host
    assert r0["losses"] == r1["losses"]
    assert r0["param_sum"] == r1["param_sum"]

    # per-process local eval ran to completion and printed its own rows
    for r in (r0, r1):
        assert r["eval_loss_finite"]
        assert r["eval_rows"] > 0
    # every host skipped every undistributable (ragged-on-mesh) batch in
    # lockstep: zero steps taken, params untouched, no deadlock
    for r in (r0, r1):
        assert r["ragged_steps"] == 0
        assert r["ragged_params_frozen"]

    # only process 0 wrote the pickle checkpoint
    assert r0["is_master"] and not r1["is_master"]
    assert (tmp_path / "exp" / "last.pt").exists()

    # both processes round-tripped the multi-writer sharded save
    assert r0["sharded_roundtrip"] and r1["sharded_roundtrip"]
