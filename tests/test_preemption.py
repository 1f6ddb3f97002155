"""Preemption-safe checkpointing (TPU pods preempt; the reference loses up
to an epoch, tf_train_tdnn.py:311): SIGTERM mid-run must checkpoint at the
current step and exit cleanly; a relaunch must resume from that step and
finish the run."""

import os
import signal
import subprocess
import sys
import time

import pytest

DRIVER = os.path.join(os.path.dirname(__file__), "preempt_driver.py")


def _run(exp_dir, save_every=0, term_after_step=None, timeout=600):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.Popen(
        [sys.executable, DRIVER, str(exp_dir), str(save_every)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
    )
    lines = []
    deadline = time.monotonic() + timeout
    sent = False
    for line in proc.stdout:
        lines.append(line.rstrip())
        if (term_after_step is not None and not sent
                and line.startswith(f"step {term_after_step}/")):
            proc.send_signal(signal.SIGTERM)
            sent = True
        if time.monotonic() > deadline:
            proc.kill()
            pytest.fail("driver timed out:\n" + "\n".join(lines[-20:]))
    rc = proc.wait(timeout=60)
    assert rc == 0, "\n".join(lines[-30:])
    return lines


def test_sigterm_checkpoints_and_resume(tmp_path):
    exp = tmp_path / "exp"

    lines = _run(exp, term_after_step=6)
    final = [ln for ln in lines if ln.startswith("PREEMPTED")]
    assert final, "\n".join(lines[-20:])
    step = int(final[0].split("step=")[1])
    assert 0 < step < 80  # stopped mid-run, not at the end

    # the checkpoint for that step exists on disk
    from voxsrc2020_speaker_verification_tpu.training.checkpoint import (
        CheckpointManager,
    )
    mgr = CheckpointManager(str(exp))
    assert mgr.latest_step() == step
    mgr.close()

    # relaunch: auto-resume from `step` and run to completion
    lines2 = _run(exp)
    assert any(ln.startswith("COMPLETED step=80") for ln in lines2), \
        "\n".join(lines2[-20:])
    first_step = next(ln for ln in lines2 if ln.startswith("step "))
    resumed_from = int(first_step.split()[1].split("/")[0])
    assert resumed_from > step  # did not restart from scratch


def test_save_every_steps(tmp_path):
    exp = tmp_path / "exp"
    _run(exp, save_every=7)
    from voxsrc2020_speaker_verification_tpu.training.checkpoint import (
        CheckpointManager,
    )
    mgr = CheckpointManager(str(exp))
    steps = set(mgr._mgr.all_steps())
    mgr.close()
    # newest max_to_keep survive; the cadence leaves mid-epoch steps kept
    assert 80 in steps
    assert any(s % 40 for s in steps), steps  # a mid-epoch checkpoint exists
    assert all(s % 7 == 0 or s % 40 == 0 for s in steps), steps
