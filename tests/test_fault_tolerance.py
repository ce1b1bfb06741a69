"""Fault injection (SURVEY.md §5): SIGKILL a training run mid-flight, then
restart and verify it resumes from the last checkpoint and completes.

The TPU-native failure story is fail-fast + frequent async checkpoints; this
is the kill-a-host integration test, scaled to one process. Runs the real
CLI (``scripts/train.py``) in subprocesses on CPU.
"""

import os
import signal
import subprocess
import sys
import time
from pathlib import Path

import pytest

REPO = Path(__file__).parent.parent
TRAIN = REPO / "scripts" / "train.py"


def _cpu_env():
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # skip axon TPU registration
    env["JAX_PLATFORMS"] = "cpu"
    return env


def _cmd(ckpt_dir, steps):
    return [
        sys.executable, str(TRAIN),
        "--config", "binaryconnect_mlp",
        "--steps", str(steps),
        "--batch-size", "64",
        "--checkpoint-dir", str(ckpt_dir),
        "--ckpt-every", "20",
    ]


def test_kill_and_resume(tmp_path):
    ckpt = tmp_path / "ckpt"

    # Run 1: start a long training run, SIGKILL it once a checkpoint lands
    # (steps=100000 guarantees the kill precedes completion).
    p = subprocess.Popen(
        _cmd(ckpt, steps=100000), env=_cpu_env(),
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    def finalized_steps():
        if not ckpt.exists():
            return []
        # finalized = renamed to a bare step-number dir (orbax writes into
        # "<step>.orbax-checkpoint-tmp" first) with its metadata present
        return [
            d for d in ckpt.iterdir()
            if d.name.isdigit() and (d / "_CHECKPOINT_METADATA").exists()
        ]

    deadline = time.time() + 300
    try:
        while time.time() < deadline:
            if finalized_steps():
                break
            if p.poll() is not None:
                out = p.stdout.read()
                pytest.fail(f"run 1 exited before checkpointing:\n{out[-2000:]}")
            time.sleep(1)
        else:
            pytest.fail("no checkpoint appeared within 300s")
        p.send_signal(signal.SIGKILL)
    finally:
        p.wait(timeout=30)

    # Run 2: finite horizon — must resume (not restart) and finish.
    r = subprocess.run(
        _cmd(ckpt, steps=500), env=_cpu_env(),
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        timeout=600,
    )
    assert r.returncode == 0, r.stdout[-2000:]
    assert "resumed from step" in r.stdout
    resumed = int(r.stdout.split("resumed from step")[1].split()[0])
    assert resumed >= 20
    assert "final eval accuracy" in r.stdout
