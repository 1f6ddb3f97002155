"""Golden-embedding parity against the reference model code (SURVEY hard
part #2): the reference's TF1 graph, built and evaluated by
tests/ref_oracle.py in a subprocess, must produce the same embeddings as our
flax models after importing its variables via utils/tf_import.py."""

import os
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from voxsrc2020_speaker_verification_tpu.models import get_model
from voxsrc2020_speaker_verification_tpu.utils import tf_import

REFERENCE = "/root/reference/tensorflow/models"
ORACLE = os.path.join(os.path.dirname(__file__), "ref_oracle.py")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference repo not mounted")


def _oracle(model_name: str, feat_dim: int, tmp_path):
    pytest.importorskip("tensorflow")
    out = tmp_path / f"{model_name}.npz"
    env = dict(os.environ, TF_USE_LEGACY_KERAS="1",
               CUDA_VISIBLE_DEVICES="", JAX_PLATFORMS="cpu")
    res = subprocess.run(
        [sys.executable, ORACLE, model_name, str(feat_dim), str(out)],
        capture_output=True, text=True, env=env, timeout=600,
    )
    if res.returncode != 0:
        pytest.fail(  # TF imported fine: crash = regression (ADVICE r4)
            f"reference oracle crashed (rc={res.returncode}): {res.stderr[-500:]}")
    return np.load(out)


@pytest.mark.parametrize("model_name,feat_dim", [
    ("res2net50_w8_s6_c16", 80),
    ("res2net101_w24_s4_c32_att", 80),  # covers att_stats_pool import
    ("tdnn", 40),
    ("dpn68", 40),
])
def test_reference_checkpoint_parity(model_name, feat_dim, tmp_path):
    data = _oracle(model_name, feat_dim, tmp_path)
    golden = data["__emb__"]
    feats4d = data["__feats__"]
    values = {k: data[k] for k in data.files if not k.startswith("__")}

    params, batch_stats = tf_import.import_reference_weights(values, model_name)

    # Collapse the reference's 4-D layout to our (B, T, F).
    feats = feats4d[:, :, 0, :] if model_name == "tdnn" else feats4d[:, :, :, 0]

    model = get_model(model_name)  # fp32 inference
    variables = {"params": params, "batch_stats": batch_stats}

    # Structural check against a fresh init: identical tree + shapes.
    init = jax.eval_shape(
        lambda k, x: model.init(k, x, False),
        jax.random.PRNGKey(0), jnp.zeros((1, 50, feat_dim)))
    got_flat = jax.tree_util.tree_leaves_with_path(variables)
    want_flat = jax.tree_util.tree_leaves_with_path(
        {"params": init["params"], "batch_stats": init["batch_stats"]})
    assert [p for p, _ in got_flat] == [p for p, _ in want_flat]
    for (p, a), (_, b) in zip(got_flat, want_flat):
        assert a.shape == b.shape, (p, a.shape, b.shape)

    ours = model.apply(variables, jnp.asarray(feats), False)
    np.testing.assert_allclose(
        np.asarray(ours), golden, rtol=2e-4, atol=2e-4)
