"""StableHLO serving-artifact test: the serialized embed function (the
frozen-graph equivalent, eval/export.py) must deserialize and reproduce the
in-process embedding without any model code."""

import os

import jax
import numpy as np

from voxsrc2020_speaker_verification_tpu.eval.export import (
    export_inference_artifact, load_inference_artifact,
)
from voxsrc2020_speaker_verification_tpu.training import (
    TrainConfig, create_train_state,
)

CFG = TrainConfig(
    model="tdnn", projection="sc_cm_linear", num_classes=4,
    dataset_length=32, feat_dim=40, feat_length=32,
    batch_size=4, num_accumulation_steps=1, bf16=False, exp_root="",
)


def test_stablehlo_roundtrip(tmp_path):
    from jax import export as jax_export

    state = create_train_state(CFG, jax.random.PRNGKey(0))
    out = str(tmp_path / "artifact")
    export_inference_artifact(CFG, state, out, stablehlo_buckets=((2, 50),))
    path = os.path.join(out, "embed_b2_t50.stablehlo")
    assert os.path.exists(path)

    with open(path, "rb") as f:
        exp = jax_export.deserialize(f.read())
    feats = np.random.RandomState(0).randn(2, 50, 40).astype(np.float32)
    mask = np.ones((2, 50), np.float32)
    got = np.asarray(exp.call(feats, mask))

    _, embed = load_inference_artifact(out)
    want = np.asarray(embed(feats, mask))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)
