"""Multi-device extraction fan-out (ref eval_inference_model.sh:27-40 runs 8
one-GPU processes; we shard the batch axis over a device mesh under GSPMD):
mesh extraction must produce the same embeddings as single-device, on the
8-virtual-device CPU mesh the conftest forces."""

import numpy as np
import pytest

import jax
from jax.sharding import Mesh

from voxsrc2020_speaker_verification_tpu.eval.export import (
    export_inference_artifact, load_inference_artifact,
)
from voxsrc2020_speaker_verification_tpu.eval.extract import (
    extract_embeddings, make_bucketed_embed_fn,
)
from voxsrc2020_speaker_verification_tpu.training import (
    TrainConfig, create_train_state,
)

CFG = TrainConfig(
    model="tdnn", projection="sc_cm_linear", num_classes=6, num_centers=2,
    dataset_length=48, feat_dim=40, feat_length=32,
    batch_size=4, num_accumulation_steps=1, bf16=False, exp_root="",
)


@pytest.fixture(scope="module")
def artifact(tmp_path_factory):
    state = create_train_state(CFG, jax.random.PRNGKey(0))
    out = str(tmp_path_factory.mktemp("exp") / "artifact")
    export_inference_artifact(CFG, state, out)
    return out


def _features(n=21, seed=0):
    rng = np.random.RandomState(seed)
    # lengths spread over chunk buckets, incl. one > 1000 (chunk-averaged)
    lengths = [int(rng.randint(30, 400)) for _ in range(n - 2)] + [1000, 1400]
    return [(f"utt{i}", rng.randn(t, CFG.feat_dim).astype(np.float32))
            for i, t in enumerate(lengths)]


def test_mesh_extraction_matches_single_device(artifact):
    assert jax.device_count() == 8
    feats = _features()

    _, embed1 = load_inference_artifact(artifact)
    single = extract_embeddings(
        make_bucketed_embed_fn(embed1, batch_size=16), iter(feats),
        batch_size=16)

    mesh = Mesh(np.asarray(jax.devices()), ("data",))
    _, embed8 = load_inference_artifact(artifact, mesh=mesh)
    sharded = extract_embeddings(
        make_bucketed_embed_fn(embed8, batch_size=16), iter(feats),
        batch_size=16)

    assert set(single) == set(sharded) == {u for u, _ in feats}
    for utt in single:
        np.testing.assert_allclose(
            sharded[utt], single[utt], rtol=1e-5, atol=1e-6, err_msg=utt)


def test_mesh_embed_fn_shards_batch(artifact):
    mesh = Mesh(np.asarray(jax.devices()), ("data",))
    _, embed8 = load_inference_artifact(artifact, mesh=mesh)
    x = np.random.RandomState(1).randn(16, 64, CFG.feat_dim).astype(np.float32)
    m = np.ones((16, 64), np.float32)
    out = embed8(x, m)
    # the output really is laid out over all 8 devices
    assert len(out.sharding.device_set) == 8
    assert out.shape == (16, out.shape[1])


def test_extract_dataset_cli_multidevice(artifact, tmp_path):
    """extract_dataset with num_devices>1 writes the same ark as 1 device."""
    from voxsrc2020_speaker_verification_tpu.cli.extract import extract_dataset
    from voxsrc2020_speaker_verification_tpu.data import kaldi_io
    from voxsrc2020_speaker_verification_tpu.utils import datadir
    import os

    d = tmp_path / "data"
    d.mkdir()
    rng = np.random.RandomState(2)
    with kaldi_io.ArkScpWriter(
            str(d / "fbank40.ark"), str(d / "fbank40.scp")) as w:
        for i in range(9):
            w.write(f"u{i}", rng.randn(
                int(rng.randint(40, 300)), 40).astype(np.float32))

    one = extract_dataset(artifact, str(d), str(tmp_path / "xv1"),
                          batch_size=8, num_devices=1)
    eight = extract_dataset(artifact, str(d), str(tmp_path / "xv8"),
                            batch_size=8, num_devices=8)
    a = dict(kaldi_io.read_vec_flt_scp(one))
    b = dict(kaldi_io.read_vec_flt_scp(eight))
    assert set(a) == set(b)
    for utt in a:
        np.testing.assert_allclose(b[utt], a[utt], rtol=1e-5, atol=1e-6)
