"""Live multi-process distributed training tests: the cli.launch wrapper
spawns 2 jax.distributed CPU processes (Gloo) that train together; both
ranks must finish and agree on the metrics.  Covers the synthetic feeder
AND the raw-audio north-star path (per-host wav.scp sharding + the raw
waveform TUPLE batch assembled across processes with
make_array_from_process_local_data)."""

import os
import socket
import subprocess
import sys

import numpy as np
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


def test_two_process_multidevice_model_sharded(tmp_path):
    """jax.distributed process boundaries COMBINED with multi-device
    model-axis sharding (round-3 review: they were only tested separately):
    2 processes x 4 virtual CPU devices each = a global 8-device mesh, with
    the classifier kernel sharded 2-way over the model axis
    (--num-model-shards 2).  Collectives cross the process boundary; both
    ranks must finish and agree on the global loss."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

    proc = subprocess.run(
        [
            sys.executable, "-m",
            "voxsrc2020_speaker_verification_tpu.cli.launch",
            "--num-processes", "2",
            "--coordinator", f"localhost:{_free_port()}",
            "--",
            "--recipe", "tdnn_voxsrc2020_vox2_dev", "--synthetic",
            "--num-model-shards", "2",
            "--max-steps", "2", "--log-every", "1", "--no-checkpoint",
            "--batch-size", "8", "--num-accumulation-steps", "1",
            "--feat-length", "24",
        ],
        cwd=str(tmp_path), env=env, capture_output=True, text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "done: 2 steps" in proc.stdout
    rank1 = (tmp_path / "launch_rank1.log").read_text()
    assert "done: 2 steps" in rank1
    line0 = [l for l in proc.stdout.splitlines() if l.startswith("step 2/2")][0]
    line1 = [l for l in rank1.splitlines() if l.startswith("step 2/2")][0]
    assert line0.split("loss")[1].split()[0] == line1.split("loss")[1].split()[0]


def test_two_process_model_sharded_res2net(tmp_path):
    """Same process-boundary x model-axis topology as above but with a
    RES2NET -- its stride-2 grouped split convs are the op class whose
    kernel gradients XLA mis-reduced over the model axis until round 5
    (ops/nn.py:grouped_conv); this pins the fix in the production
    multi-process path, not just the single-process virtual mesh."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

    proc = subprocess.run(
        [
            sys.executable, "-m",
            "voxsrc2020_speaker_verification_tpu.cli.launch",
            "--num-processes", "2",
            "--coordinator", f"localhost:{_free_port()}",
            "--",
            "--recipe", "res2net_vox2_dev_aug",
            "--model", "res2net50_w8_s6_c16", "--synthetic",
            "--num-model-shards", "2",
            "--max-steps", "2", "--log-every", "1", "--no-checkpoint",
            "--batch-size", "8", "--num-accumulation-steps", "1",
            "--feat-length", "32",
        ],
        cwd=str(tmp_path), env=env, capture_output=True, text=True,
        timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "done: 2 steps" in proc.stdout
    rank1 = (tmp_path / "launch_rank1.log").read_text()
    assert "done: 2 steps" in rank1
    line0 = [l for l in proc.stdout.splitlines() if l.startswith("step 2/2")][0]
    line1 = [l for l in rank1.splitlines() if l.startswith("step 2/2")][0]
    assert line0.split("loss")[1].split()[0] == line1.split("loss")[1].split()[0]


def test_two_process_launch_raw(tmp_path):
    """Raw-audio mode across 2 processes: each rank feeds its strided
    wav.scp shard through the native raw feeder; the (waves, num_samples,
    target_offset, pad_shift) tuple is assembled into global jax.Arrays
    across processes and FBANK+CMVN run on device inside the step."""
    import pickle

    from voxsrc2020_speaker_verification_tpu.data import audio
    from voxsrc2020_speaker_verification_tpu.recipes import get_recipe

    config, _ = get_recipe("tdnn_voxsrc2020_vox2_dev")
    data_dir = tmp_path / "data" / config.dataset
    data_dir.mkdir(parents=True)
    rng = np.random.RandomState(0)
    utt2id = {}
    with open(data_dir / "wav.scp", "w") as f:
        for i in range(8):
            utt = f"u{i}"
            path = str(data_dir / f"{utt}.wav")
            audio.write_wav(path, (rng.randn(12000) * 2000)
                            .astype(np.float32))
            f.write(f"{utt} {path}\n")
            utt2id[utt] = i % 3
    with open(data_dir / "utt2id.pkl", "wb") as f:
        pickle.dump(utt2id, f)

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env.pop("XLA_FLAGS", None)

    proc = subprocess.run(
        [
            sys.executable, "-m",
            "voxsrc2020_speaker_verification_tpu.cli.launch",
            "--num-processes", "2",
            "--coordinator", f"localhost:{_free_port()}",
            "--",
            "--recipe", "tdnn_voxsrc2020_vox2_dev", "--raw",
            "--data-root", "data", "--num-workers", "1",
            "--max-steps", "2", "--log-every", "1", "--no-checkpoint",
            "--batch-size", "4", "--num-accumulation-steps", "1",
            "--feat-length", "24",
        ],
        cwd=str(tmp_path), env=env, capture_output=True, text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "done: 2 steps" in proc.stdout
    rank1 = (tmp_path / "launch_rank1.log").read_text()
    assert "done: 2 steps" in rank1
    line0 = [l for l in proc.stdout.splitlines() if l.startswith("step 2/2")][0]
    line1 = [l for l in rank1.splitlines() if l.startswith("step 2/2")][0]
    assert line0.split("loss")[1].split()[0] == line1.split("loss")[1].split()[0]
