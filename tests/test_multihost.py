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
import re
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np


def free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def multihost_env(port, pid, n_local_devices=4, pc=2):
    env = dict(os.environ)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "PALLAS_AXON_POOL_IPS": "",
        "XLA_FLAGS":
            f"--xla_force_host_platform_device_count={n_local_devices}",
        "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
        "JAX_NUM_PROCESSES": str(pc),
        "JAX_PROCESS_ID": str(pid),
    })
    return env


import pytest  # noqa: E402


@pytest.mark.parametrize("pc,local", [(2, 4), (4, 2)],
                         ids=["2proc-4dev", "4proc-2dev"])
def test_multi_process_hac(tmp_path, pc, local):
    """pc local processes x `local` virtual devices each (8 global):
    the same surface must hold at any process count (VERDICT r3 weak 5
    bounded generality at pc=2) — disjoint equal loader shards,
    identical replicated params on every host, lockstep ragged skips,
    master-only pickle writes, orbax multi-writer with pc writers."""
    port = free_port()
    child = Path(__file__).parent / "multihost_child.py"
    procs = []
    for pid in range(pc):
        procs.append(subprocess.Popen(
            [sys.executable, str(child), str(tmp_path)],
            env=multihost_env(port, pid, n_local_devices=local, pc=pc),
            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True))
    outs = [p.communicate(timeout=600) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, f"child failed:\n{out}\n{err[-3000:]}"
        assert "CHILD-OK" in out

    reports = [json.loads((tmp_path / f"report_{pid}.json").read_text())
               for pid in range(pc)]

    # every process saw the global topology
    for r in reports:
        assert r["pc"] == pc and r["global_devices"] == 8
        assert r["local_devices"] == local

    # per-process dataset shards are disjoint, EQUAL-SIZED (loader
    # equalization: no host may run more steps than another), and
    # cover the set
    shards = [set(r["indices"]) for r in reports]
    assert len({len(s) for s in shards}) == 1, shards
    assert set().union(*shards) == set(range(16))
    assert sum(len(s) for s in shards) == 16          # pairwise disjoint

    # the global steps produced identical replicated params everywhere
    for r in reports[1:]:
        assert r["losses"] == reports[0]["losses"]
        assert r["param_sum"] == reports[0]["param_sum"]

    # per-process local eval ran to completion and printed its own rows;
    # every host skipped every undistributable (ragged-on-mesh) batch in
    # lockstep: zero steps taken, params untouched, no deadlock
    for r in reports:
        assert r["eval_loss_finite"]
        assert r["eval_rows"] > 0
        assert r["ragged_steps"] == 0
        assert r["ragged_params_frozen"]

    # only process 0 wrote the pickle checkpoint
    assert reports[0]["is_master"]
    assert not any(r["is_master"] for r in reports[1:])
    assert (tmp_path / "exp" / "last.pt").exists()

    # all pc processes round-tripped the multi-writer sharded save
    assert all(r["sharded_roundtrip"] for r in reports)


def test_two_process_hala(tmp_path):
    """Two-process hala CLI end-to-end — the exact distributed surface
    of the reference (DDP lives in hala ONLY, ha/attention_loop.py:
    67-80): per-process disjoint batch windows assembled into one
    global SPMD batch, collective data-parallel eval, master-only
    logging/checkpointing, and replicated params provably identical on
    both hosts after training (per-process checksum lines)."""
    rng = np.random.default_rng(0)
    # byte-ish corpus with learnable structure: loss must fall
    pattern = np.tile(np.arange(32, dtype=np.uint16) % 250 + 1, 4096)
    noise = rng.integers(1, 250, len(pattern), dtype=np.uint16)
    train = np.where(rng.random(len(pattern)) < 0.05, noise, pattern)
    train.tofile(tmp_path / "train.bin")
    train[: 64 * 4 * 2 * 4].tofile(tmp_path / "val.bin")

    argv = [
        sys.executable, "-m", "haloop_tpu.attention_loop",
        "--arch", "gpt-nano:256:64",
        "--train", str(tmp_path / "train.bin"),
        "--eval", str(tmp_path / "val.bin"),
        "--batch_size", "4", "--block_size", "64",
        "--gradient_accumulation_steps", "2",
        "--max_iters", "24", "--eval-interval", "12",
        "--log-interval", "4", "--lr", "2e-3", "--warmup_iters", "1",
        "--exp", str(tmp_path / "exp"), "--save", "last+best",
    ]
    port = free_port()
    procs = [subprocess.Popen(argv, env=multihost_env(port, pid),
                              stdout=subprocess.PIPE,
                              stderr=subprocess.PIPE, text=True,
                              cwd=Path(__file__).parent.parent)
             for pid in range(2)]
    outs = [p.communicate(timeout=600) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, f"hala child failed:\n{out}\n{err[-3000:]}"

    (out0, err0), (out1, err1) = outs

    # master logs train/eval/checkpoint lines; the worker logs none
    iters0 = re.findall(r"iter (\d+): loss ([\d.]+)", out0)
    assert len(iters0) >= 5, out0
    assert "eval 12: val loss" in out0 and "eval 24: val loss" in out0
    assert "saving checkpoint" in out0
    assert "iter" not in out1 and "eval" not in out1 \
        and "saving" not in out1, out1

    # training learns: loss falls across the run
    losses = [float(l) for _, l in iters0]
    assert losses[-1] < losses[0] - 0.5, losses

    # replicated params are bit-identical across hosts after 12 global
    # steps (the checksum is printed independently by each process)
    sums = {}
    for pid, err in ((0, err0), (1, err1)):
        m = re.search(
            r"process (\d+): param checksum ([\d.e+-]+) after (\d+)", err)
        assert m, err[-2000:]
        assert int(m.group(1)) == pid
        sums[pid] = m.group(2)
        assert int(m.group(3)) == 25
    assert sums[0] == sums[1], sums

    # only one checkpoint tree, written by the master
    from haloop_tpu.checkpoint import load_checkpoint
    ckpt = load_checkpoint(tmp_path / "exp" / "last.pt")
    assert ckpt["iter_num"] == 24
    assert np.isfinite(ckpt["val_loss"])


def test_four_process_hala_divisibility_guard(tmp_path):
    """hala refuses a global batch that does not divide the mesh
    BEFORE training (4 processes x batch 3 = 12 rows on 8 devices):
    the guard must fire identically on every process instead of
    deadlocking some hosts inside a collective."""
    rng = np.random.default_rng(0)
    train = rng.integers(1, 250, 64 * 64, dtype=np.uint16)
    train.tofile(tmp_path / "train.bin")
    argv = [
        sys.executable, "-m", "haloop_tpu.attention_loop",
        "--arch", "gpt-nano:256:64",
        "--train", str(tmp_path / "train.bin"),
        "--batch_size", "3", "--block_size", "64",
        "--max_iters", "2", "--save", "none",
        "--exp", str(tmp_path / "exp"),
    ]
    port = free_port()
    procs = [subprocess.Popen(
        argv, env=multihost_env(port, pid, n_local_devices=2, pc=4),
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        cwd=Path(__file__).parent.parent) for pid in range(4)]
    outs = [p.communicate(timeout=600) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode != 0
        assert "does not divide" in err, err[-1500:]


def test_two_process_hac_sharded_checkpoint(tmp_path):
    """Two-process hac CLI with --ckpt-format sharded: orbax saves are
    collective, so BOTH processes must participate in the Checkpointer
    (a master-only gate deadlocks process 0 inside sync_global_devices
    — the bug this locks out). Asserts clean exit, a restorable orbax
    checkpoint directory, and master-only logging."""
    argv = [
        sys.executable, "-m", "haloop_tpu.loop",
        "--arch", "lstm-tiny:512", "--vocab", "512",
        "--train", "head:sinusoids0", "--eval", "head:sinusoids0",
        "--num-epochs", "1", "--batch-size", "4",
        "--lr", "1e-3", "--lr_schedule", "const",
        "--clip-grad-norm", "10", "--exp", str(tmp_path / "exp"),
        "--save", "last+best", "--ckpt-format", "sharded",
        "--log-interval", "2", "--quiet",
    ]
    port = free_port()
    procs = [subprocess.Popen(argv, env=multihost_env(port, pid),
                              stdout=subprocess.PIPE,
                              stderr=subprocess.PIPE, text=True,
                              cwd=Path(__file__).parent.parent)
             for pid in range(2)]
    outs = [p.communicate(timeout=600) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, f"hac child failed:\n{out}\n{err[-3000:]}"

    # the orbax directory round-trips on a fresh single-process load
    from haloop_tpu.checkpoint import load_checkpoint
    ckpt = load_checkpoint(tmp_path / "exp" / "last.pt")
    assert "encoder" in ckpt and "recognizer" in ckpt
    assert all(np.isfinite(np.asarray(x)).all()
               for x in ckpt["encoder"].values()
               if hasattr(x, "shape"))

    # master logs training progress lines; the worker prints only its
    # own eval rows (train lines carry grad_norm, valid summaries don't)
    assert "grad_norm:" in outs[0][1]
    assert "grad_norm:" not in outs[1][1], outs[1][1][-1500:]
