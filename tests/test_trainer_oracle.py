"""Trainer-step parity against the REFERENCE trainer graph run as an oracle
(ref tf_train_tdnn.py:194-317): identical init (via tf_import), identical
synthetic batches, 10 optimizer steps x 2 accumulation microbatches crossing
the LR warmup boundary and two margin staircase increments.  Asserts per-step
loss / reg / accuracy / LR / total-margin AND the final parameters, momentum
traces, and BN moving statistics all match.

Parameterized over the model families the reference trains through this one
trainer: TDNN (1-D convs), Res2Net (batched split convs + stride-2 avg-pool
passthrough, ref res2net_model.py:53-78) and DPN (dual-path residual+dense
concat, ref dpn_model.py:57-87) -- so gradient/update/BN-moving-stat parity
covers the north-star family, not just checkpoint-level forwards."""

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
MODELS = ["tdnn", "res2net50_w8_s6_c16", "dpn68"]
FEAT_LENGTH = {"tdnn": 50}  # must mirror ref_trainer_oracle.MODEL_T
DEFAULT_T = 32
# base LR per model: must mirror ref_trainer_oracle.MODEL_LR.
BASE_LR = {"tdnn": 0.08 / 128 * 8}
DEFAULT_LR = 0.08 / 128 * 8 / 10.0

# Tolerance profiles, calibrated by measurement.  The TDNN tracks the
# reference bit-tightly for 10 full-LR steps.  The deep 2-D CNNs are
# measurably chaotic: a 1-ulp param perturbation moves their step-0 CE by
# ~2e-4, the two backends (TF CPU vs XLA CPU) differ at exactly that
# reorder level, and the deviation compounds ~2x per step even at LR/10 --
# with NO wiring difference.  Their profile allows the measured noise
# (CE <=1.6e-3 rel through step 5, <=2.7e-2 by step 9; final param maxdiff
# 7.7e-5, BN-stat 1.2e-3, momentum 6e-2) with 3-5x headroom -- still
# orders of magnitude below any architecture-level gradient error (a wrong
# split-conv/dual-path backward moves CE by O(1) and params by O(1e-1)).
# The trainer *wiring* itself (l2, clip, momentum, accumulation, schedule
# keying) is proven bit-tight by the TDNN run; the deep runs pin the
# model-specific gradient and BN-update paths.
TDNN_TOL = dict(ce_early=2e-4, ce_late=2e-4, reg=1e-5,
                acc_early=1e-6, acc_late=1e-6,
                param=(1e-4, 1e-5), stat=(1e-4, 1e-5), mom=(1e-3, 5e-4),
                mom_frac=True)
DEEP_TOL = dict(ce_early=5e-3, ce_late=8e-2, reg=1e-3,
                # accuracy at chance level flips on argmax ties under fp
                # noise: allow one flipped sample per 8 early, two late
                acc_early=0.13, acc_late=0.26,
                param=(1e-3, 5e-4), stat=(1e-2, 5e-3), mom=(5e-2, 0.15),
                mom_frac=False)
EARLY_STEPS = 6  # chaos compounding stays near the forward-noise floor


@pytest.fixture(scope="module", params=MODELS)
def oracle(request, tmp_path_factory):
    pytest.importorskip("tensorflow")
    model = request.param
    out = tmp_path_factory.mktemp("trainer") / f"trainer_oracle_{model}.npz"
    # NB: oneDNN must stay ON -- vanilla TF-CPU has no dilated-conv
    # backward (the TDNN's dilation-3 block dies in Conv2DBackpropFilter
    # with TF_ENABLE_ONEDNN_OPTS=0), and disabling it does not reduce the
    # deep models' reorder noise anyway (measured: ~3e-4 either way).
    env = dict(os.environ, TF_USE_LEGACY_KERAS="1",
               CUDA_VISIBLE_DEVICES="", JAX_PLATFORMS="cpu")
    res = subprocess.run(
        [sys.executable, ORACLE, str(out), model],
        capture_output=True, text=True, env=env, timeout=1800,
    )
    if res.returncode != 0:
        pytest.fail(  # TF imported fine: crash = regression (ADVICE r4)
            f"reference trainer oracle crashed (rc={res.returncode}): {res.stderr[-800:]}")
    return model, np.load(out)


def _import_tree(model, values, prefix):
    """tf_import a {'<prefix>/<var>:0': arr} snapshot -> (params, stats)."""
    snap = {k[len(prefix):]: values[k] for k in values.files
            if k.startswith(prefix)}
    return tf_import.import_reference_weights(
        snap, model, projection_id="sc_cm_linear")


def _assert_tree_close(got, want, rtol, atol, what):
    got_flat = jax.tree_util.tree_leaves_with_path(got)
    want_flat = jax.tree_util.tree_leaves_with_path(want)
    assert [p for p, _ in got_flat] == [p for p, _ in want_flat], what
    for (p, a), (_, b) in zip(got_flat, want_flat):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=rtol, atol=atol,
            err_msg=f"{what} {jax.tree_util.keystr(p)}")


def test_trainer_step_matches_reference(oracle):
    model, oracle = oracle
    feats = oracle["__feats__"]    # (n_micro, B, T, F)
    labels = oracle["__labels__"]  # (n_micro, B)
    log = oracle["__log__"]        # per microbatch: gs ce reg acc lr margin
    n_micro = feats.shape[0]
    num_steps = n_micro // ACCUM

    config = TrainConfig(
        model=model, projection="sc_cm_linear", num_classes=11,
        dataset_length=16, feat_dim=40,
        feat_length=FEAT_LENGTH.get(model, DEFAULT_T),
        batch_size=4, num_accumulation_steps=ACCUM,
        base_lr=BASE_LR.get(model, DEFAULT_LR),
        bf16=False, specaug=False,
    )
    assert config.epoch_size == int(oracle["__epoch_size__"])

    params, batch_stats = _import_tree(model, oracle, "init/")
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
    tol = TDNN_TOL if model == "tdnn" else DEEP_TOL

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
        ce_tol = tol["ce_early"] if k < EARLY_STEPS else tol["ce_late"]
        np.testing.assert_allclose(
            float(m["classification_loss"]), rows[:, 1].mean(),
            rtol=ce_tol, atol=ce_tol, err_msg=f"ce @ step {k}")
        np.testing.assert_allclose(
            float(m["regularization_loss"]), rows[0, 2],
            rtol=tol["reg"], atol=1e-6, err_msg=f"reg @ step {k}")
        acc_tol = tol["acc_early"] if k < EARLY_STEPS else tol["acc_late"]
        np.testing.assert_allclose(
            float(m["accuracy"]), rows[:, 3].mean(),
            rtol=0, atol=acc_tol, err_msg=f"acc @ step {k}")

    assert int(state.step) == num_steps

    # Final parameters and BN moving statistics.
    want_params, want_stats = _import_tree(model, oracle, "final/")
    _assert_tree_close(state.params, want_params, *tol["param"], "param")
    _assert_tree_close(state.batch_stats, want_stats, *tol["stat"], "bn stat")

    # Momentum traces: the reference's slot variables live at
    # "<var>/Momentum"; strip the suffix and reuse the importer.
    slot = {k[len("final/"):-len("/Momentum:0")] + ":0": oracle[k]
            for k in oracle.files if k.endswith("/Momentum:0")}
    want_momentum, _ = tf_import.import_reference_weights(
        slot, model, projection_id="sc_cm_linear", params_only=True)
    # The momentum trace is the most fp-noise-amplified quantity (a decaying
    # sum of ten clipped gradients, computed by TF on one side and XLA-CPU
    # on the other).  Wiring errors (wrong decay, clip placement, missing
    # l2) are systematic across all elements; fp noise shows up as strays --
    # for the TDNN assert tightly on the 99.99% bulk and loosely on the max.
    _assert_tree_close(state.momentum, want_momentum, *tol["mom"], "momentum")
    if tol["mom_frac"]:
        for (p, a), (_, b) in zip(
                jax.tree_util.tree_leaves_with_path(state.momentum),
                jax.tree_util.tree_leaves_with_path(want_momentum)):
            frac = np.mean(np.abs(np.asarray(a) - np.asarray(b)) > 5e-5)
            assert frac < 1e-3, (jax.tree_util.keystr(p), frac)
