"""Raw-audio extraction parity: --raw (wav.scp + on-device FBANK) must
produce the same embeddings as extraction from a precomputed feature scp
(both dither-free)."""

import os

import jax
import numpy as np
import pytest

from voxsrc2020_speaker_verification_tpu.data import audio, kaldi_io
from voxsrc2020_speaker_verification_tpu.eval.export import export_inference_artifact
from voxsrc2020_speaker_verification_tpu.training import TrainConfig, create_train_state
from voxsrc2020_speaker_verification_tpu.utils import datadir


CFG = TrainConfig(
    model="tdnn", projection="sc_cm_linear", num_classes=4,
    dataset_length=32, feat_dim=40, feat_length=32,
    batch_size=4, num_accumulation_steps=1, bf16=False, exp_root="",
)


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("rawx")
    d = str(root / "data")
    os.makedirs(d)
    rng = np.random.RandomState(0)
    wav, utt2spk = {}, {}
    for i in range(3):
        p = str(root / f"u{i}.wav")
        audio.write_wav(p, (rng.randn(16000 + 5000 * i) * 2000).astype(np.float32))
        wav[f"u{i}"] = p
        utt2spk[f"u{i}"] = "spk"
    datadir.write_two_column(os.path.join(d, "wav.scp"), wav)
    datadir.write_two_column(os.path.join(d, "utt2spk"), utt2spk)

    from voxsrc2020_speaker_verification_tpu.data.features import (
        compute_features_for_dir,
    )
    compute_features_for_dir(d, 40, compress=False, batch_size=2,
                             bucket_seconds=(2, 4))

    state = create_train_state(CFG, jax.random.PRNGKey(0))
    artifact = str(root / "artifact")
    export_inference_artifact(CFG, state, artifact)
    return d, artifact


def test_raw_matches_feature_scp(setup):
    from voxsrc2020_speaker_verification_tpu.cli.extract import extract_dataset

    d, artifact = setup
    scp_feat = extract_dataset(artifact, d, os.path.join(d, "xv_feat"),
                               batch_size=4)
    scp_raw = extract_dataset(artifact, d, os.path.join(d, "xv_raw"),
                              batch_size=4, raw=True)
    a = dict(kaldi_io.read_vec_flt_scp(scp_feat))
    b = dict(kaldi_io.read_vec_flt_scp(scp_raw))
    assert set(a) == set(b) == {"u0", "u1", "u2"}
    for k in a:
        np.testing.assert_allclose(a[k], b[k], atol=1e-4, rtol=1e-4)
