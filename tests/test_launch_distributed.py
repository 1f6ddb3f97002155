"""Live multi-process distributed training test: the cli.launch wrapper
spawns 2 jax.distributed CPU processes (Gloo) that train synthetic data
together; both ranks must finish and agree on the metrics."""

import os
import socket
import subprocess
import sys

import pytest


def _free_port():
    with socket.socket() as s:
        s.bind(("", 0))
        return s.getsockname()[1]


def test_two_process_launch(tmp_path):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # the spawned processes must not inherit the test conftest's 8-device
    # XLA override in a conflicting way; 1 device per process is fine
    env.pop("XLA_FLAGS", None)

    proc = subprocess.run(
        [
            sys.executable, "-m",
            "voxsrc2020_speaker_verification_tpu.cli.launch",
            "--num-processes", "2",
            "--coordinator", f"localhost:{_free_port()}",
            "--",
            "--recipe", "tdnn_voxsrc2020_vox2_dev", "--synthetic",
            "--max-steps", "2", "--log-every", "1", "--no-checkpoint",
            "--batch-size", "4", "--num-accumulation-steps", "1",
            "--feat-length", "24",
        ],
        cwd=str(tmp_path), env=env, capture_output=True, text=True,
        timeout=400,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "done: 2 steps" in proc.stdout
    rank1 = (tmp_path / "launch_rank1.log").read_text()
    assert "done: 2 steps" in rank1
    # both ranks computed the same global loss
    line0 = [l for l in proc.stdout.splitlines() if l.startswith("step 2/2")][0]
    line1 = [l for l in rank1.splitlines() if l.startswith("step 2/2")][0]
    assert line0.split("loss")[1].split()[0] == line1.split("loss")[1].split()[0]
