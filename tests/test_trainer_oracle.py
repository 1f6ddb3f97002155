"""Trainer-step parity against the REFERENCE trainer graph run as an oracle
(ref tf_train_tdnn.py:194-317): identical init (via tf_import), identical
synthetic batches, 10 optimizer steps x 2 accumulation microbatches crossing
the LR warmup boundary and two margin staircase increments.  Asserts per-step
loss / reg / accuracy / LR / total-margin AND the final parameters, momentum
traces, and BN moving statistics all match."""

import os
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from voxsrc2020_speaker_verification_tpu.training import (
    TrainConfig, create_train_state, make_train_step,
)
from voxsrc2020_speaker_verification_tpu.training.trainer import TrainState
from voxsrc2020_speaker_verification_tpu.utils import tf_import

REFERENCE = "/root/reference/tensorflow/tf_train_tdnn.py"
ORACLE = os.path.join(os.path.dirname(__file__), "ref_trainer_oracle.py")

pytestmark = pytest.mark.skipif(
    not os.path.isfile(REFERENCE), reason="reference repo not mounted")

ACCUM = 2


@pytest.fixture(scope="module")
def oracle(tmp_path_factory):
    pytest.importorskip("tensorflow")
    out = tmp_path_factory.mktemp("trainer") / "trainer_oracle.npz"
    env = dict(os.environ, TF_USE_LEGACY_KERAS="1",
               CUDA_VISIBLE_DEVICES="", JAX_PLATFORMS="cpu")
    res = subprocess.run(
        [sys.executable, ORACLE, str(out)],
        capture_output=True, text=True, env=env, timeout=900,
    )
    if res.returncode != 0:
        pytest.skip(f"reference trainer oracle failed: {res.stderr[-800:]}")
    return np.load(out)


def _import_tree(values, prefix):
    """tf_import a {'<prefix>/<var>:0': arr} snapshot -> (params, stats)."""
    snap = {k[len(prefix):]: values[k] for k in values.files
            if k.startswith(prefix)}
    return tf_import.import_reference_weights(
        snap, "tdnn", projection_id="sc_cm_linear")


def _assert_tree_close(got, want, rtol, atol, what):
    got_flat = jax.tree_util.tree_leaves_with_path(got)
    want_flat = jax.tree_util.tree_leaves_with_path(want)
    assert [p for p, _ in got_flat] == [p for p, _ in want_flat], what
    for (p, a), (_, b) in zip(got_flat, want_flat):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=rtol, atol=atol,
            err_msg=f"{what} {jax.tree_util.keystr(p)}")


def test_trainer_step_matches_reference(oracle):
    feats = oracle["__feats__"]    # (n_micro, B, T, F)
    labels = oracle["__labels__"]  # (n_micro, B)
    log = oracle["__log__"]        # per microbatch: gs ce reg acc lr margin
    n_micro = feats.shape[0]
    num_steps = n_micro // ACCUM

    config = TrainConfig(
        model="tdnn", projection="sc_cm_linear", num_classes=11,
        dataset_length=16, feat_dim=40, feat_length=50,
        batch_size=4, num_accumulation_steps=ACCUM,
        bf16=False, specaug=False,
    )
    assert config.epoch_size == int(oracle["__epoch_size__"])

    params, batch_stats = _import_tree(oracle, "init/")
    state = create_train_state(config, jax.random.PRNGKey(0))
    _assert_tree_close(  # same shapes as a fresh init (catches map drift)
        jax.tree.map(np.shape, {"p": params, "s": batch_stats}),
        jax.tree.map(np.shape, {"p": state.params, "s": state.batch_stats}),
        0, 0, "init shape")
    state = TrainState(
        step=state.step,
        params=jax.tree.map(jnp.asarray, params),
        batch_stats=jax.tree.map(jnp.asarray, batch_stats),
        momentum=jax.tree.map(
            lambda p: jnp.zeros(np.shape(p), jnp.float32), params),
    )

    step = jax.jit(make_train_step(config))
    rng = jax.random.PRNGKey(3)  # unused: no specaug, no raw audio

    for k in range(num_steps):
        rows = log[k * ACCUM:(k + 1) * ACCUM]
        x = jnp.asarray(feats[k * ACCUM:(k + 1) * ACCUM])
        y = jnp.asarray(labels[k * ACCUM:(k + 1) * ACCUM])
        state, m = step(state, x, y, rng)

        # Schedules are exact piecewise formulas -> near-exact match.
        np.testing.assert_allclose(
            float(m["learning_rate"]), rows[0, 4], rtol=1e-6, atol=1e-9,
            err_msg=f"lr @ step {k}")
        np.testing.assert_allclose(
            float(m["margin"]), rows[0, 5], rtol=1e-6, atol=1e-9,
            err_msg=f"margin @ step {k}")
        # Both reference microbatches run on the pre-update params; compare
        # their mean CE / reg / accuracy to our scanned means.
        np.testing.assert_allclose(
            float(m["classification_loss"]), rows[:, 1].mean(),
            rtol=2e-4, atol=2e-4, err_msg=f"ce @ step {k}")
        np.testing.assert_allclose(
            float(m["regularization_loss"]), rows[0, 2],
            rtol=1e-5, atol=1e-6, err_msg=f"reg @ step {k}")
        np.testing.assert_allclose(
            float(m["accuracy"]), rows[:, 3].mean(),
            rtol=0, atol=1e-6, err_msg=f"acc @ step {k}")

    assert int(state.step) == num_steps

    # Final parameters and BN moving statistics.
    want_params, want_stats = _import_tree(oracle, "final/")
    _assert_tree_close(state.params, want_params, 1e-4, 1e-5, "param")
    _assert_tree_close(state.batch_stats, want_stats, 1e-4, 1e-5, "bn stat")

    # Momentum traces: the reference's slot variables live at
    # "<var>/Momentum"; strip the suffix and reuse the importer.
    slot = {k[len("final/"):-len("/Momentum:0")] + ":0": oracle[k]
            for k in oracle.files if k.endswith("/Momentum:0")}
    want_momentum, _ = tf_import.import_reference_weights(
        slot, "tdnn", projection_id="sc_cm_linear", params_only=True)
    # The momentum trace is the most fp-noise-amplified quantity (a decaying
    # sum of ten clipped gradients, computed by TF-oneDNN on one side and
    # XLA-CPU on the other).  Wiring errors (wrong decay, clip placement,
    # missing l2) are systematic across all elements; fp noise shows up as
    # a handful of ~1e-4 strays -- so assert tightly on the 99.99% bulk and
    # loosely on the max.
    _assert_tree_close(state.momentum, want_momentum, 1e-3, 5e-4, "momentum")
    for (p, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(state.momentum),
            jax.tree_util.tree_leaves_with_path(want_momentum)):
        frac = np.mean(np.abs(np.asarray(a) - np.asarray(b)) > 5e-5)
        assert frac < 1e-3, (jax.tree_util.keystr(p), frac)
