"""Long-utterance extraction parity: CMVN must be computed over the FULL
utterance before 1000-frame chunking (ref tf_extract.py:63 + :96-111).
Catches the per-chunk-CMVN regression: chunk-local windows change the
statistics near internal chunk boundaries for utterances > 1000 frames."""

import os

import jax
import numpy as np

from voxsrc2020_speaker_verification_tpu.data import kaldi_io
from voxsrc2020_speaker_verification_tpu.eval.export import (
    export_inference_artifact, load_inference_artifact,
)
from voxsrc2020_speaker_verification_tpu.eval.extract import chunk_spans
from voxsrc2020_speaker_verification_tpu.ops.cmvn import sliding_cmvn
from voxsrc2020_speaker_verification_tpu.training import (
    TrainConfig, create_train_state,
)

CFG = TrainConfig(
    model="tdnn", projection="sc_cm_linear", num_classes=4,
    dataset_length=32, feat_dim=40, feat_length=32,
    batch_size=4, num_accumulation_steps=1, bf16=False, exp_root="",
)


def test_long_utterance_full_cmvn_then_chunk(tmp_path):
    from voxsrc2020_speaker_verification_tpu.cli.extract import extract_dataset

    state = create_train_state(CFG, jax.random.PRNGKey(0))
    artifact = str(tmp_path / "artifact")
    export_inference_artifact(CFG, state, artifact)
    _, embed = load_inference_artifact(artifact)

    d = str(tmp_path / "data")
    os.makedirs(d)
    rng = np.random.RandomState(0)
    t = 1500  # > 1000 frames -> two chunks
    feat = (rng.randn(t, 40) * 2 + np.linspace(0, 5, t)[:, None]).astype(np.float32)
    with kaldi_io.ArkScpWriter(os.path.join(d, "fbank40.ark"),
                               os.path.join(d, "fbank40.scp")) as w:
        w.write("long", feat)

    scp = extract_dataset(artifact, d, os.path.join(d, "xv"), batch_size=4)
    got = dict(kaldi_io.read_vec_flt_scp(scp))["long"]

    # reference computation: full-utterance CMVN, then chunk + weighted avg
    norm = np.asarray(sliding_cmvn(feat[None], window=300, center=True))[0]
    acc, wsum = 0.0, 0.0
    for start, length in chunk_spans(t):
        chunk = np.zeros((1, length, 40), np.float32)
        chunk[0] = norm[start: start + length]
        e = np.asarray(embed(chunk, np.ones((1, length), np.float32)))[0]
        acc = acc + e * length
        wsum += length
    want = (acc / wsum).astype(np.float32)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)
