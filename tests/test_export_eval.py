"""Export -> extract -> score end-to-end on tiny data.

Covers the reference's export_inference_model.sh + eval_inference_model.sh
surface: artifact export/load roundtrip, projection cohort-weight export
(export_projection_weight.py semantics), CLI extraction with fused sliding
CMVN, and cosine/asnorm scoring with EER output.
"""

import os
import pickle

import jax
import numpy as np
import pytest

from voxsrc2020_speaker_verification_tpu.data import kaldi_io
from voxsrc2020_speaker_verification_tpu.eval.export import (
    export_inference_artifact, export_projection_weights,
    load_inference_artifact,
)
from voxsrc2020_speaker_verification_tpu.training import (
    TrainConfig, create_train_state,
)
from voxsrc2020_speaker_verification_tpu.utils import datadir


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
    return out, state


class TestExport:
    def test_projection_weights_shape_and_norm(self, artifact):
        out, state = artifact
        w = export_projection_weights(state.params)
        # kernel [K=2, emb, C=6] -> (12, emb), row-l2-normed
        assert w.shape[0] == 2 * CFG.num_classes
        np.testing.assert_allclose(np.linalg.norm(w, axis=1), 1.0, atol=1e-5)
        with open(os.path.join(out, "projection_weight.pkl"), "rb") as f:
            saved = pickle.load(f)
        np.testing.assert_allclose(saved, w, atol=1e-6)

    def test_artifact_roundtrip(self, artifact):
        out, state = artifact
        config, embed = load_inference_artifact(out)
        assert config.model == CFG.model and config.feat_dim == CFG.feat_dim
        feats = np.random.RandomState(0).randn(2, 50, CFG.feat_dim).astype(np.float32)
        mask = np.ones((2, 50), np.float32)
        emb = np.asarray(embed(feats, mask))
        assert emb.shape[0] == 2 and np.isfinite(emb).all()
        # embed must equal the in-process net applied to the same variables
        from voxsrc2020_speaker_verification_tpu.training import build_speaker_net
        from voxsrc2020_speaker_verification_tpu.training.speaker_net import SpeakerNet
        net = build_speaker_net(CFG)
        want = net.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            feats, mask, method=SpeakerNet.embed,
        )
        np.testing.assert_allclose(emb, np.asarray(want), atol=1e-5)


@pytest.fixture(scope="module")
def eval_data(tmp_path_factory, artifact):
    """Tiny data dir with fbank feats + trials for 4 utts / 2 speakers."""
    out, _ = artifact
    d = str(tmp_path_factory.mktemp("data") / "test")
    os.makedirs(d)
    rng = np.random.RandomState(1)
    utts = [f"spk{s}-utt{i}" for s in range(2) for i in range(2)]
    with kaldi_io.ArkScpWriter(os.path.join(d, "fbank40.ark"),
                               os.path.join(d, "fbank40.scp")) as w:
        for u in utts:
            base = rng.randn(1, 40) * 2
            w.write(u, (base + 0.5 * rng.randn(60, 40)).astype(np.float32))
    datadir.write_two_column(
        os.path.join(d, "utt2spk"), {u: u.split("-")[0] for u in utts})
    datadir.write_spk2utt(
        os.path.join(d, "spk2utt"),
        {"spk0": utts[:2], "spk1": utts[2:]})
    with open(os.path.join(d, "trials"), "w") as f:
        f.write(f"1 {utts[0]} {utts[1]}\n0 {utts[0]} {utts[2]}\n"
                f"1 {utts[2]} {utts[3]}\n0 {utts[1]} {utts[3]}\n")
    return d


class TestExtractScoreCLI:
    def test_extract(self, artifact, eval_data, capsys):
        from voxsrc2020_speaker_verification_tpu.cli import extract
        out, _ = artifact
        prefix = os.path.join(eval_data, "xvector")
        extract.main(["--artifact", out, "--data-dir", eval_data,
                      "--out", prefix, "--batch-size", "4"])
        vecs = dict(kaldi_io.read_vec_flt_scp(prefix + ".scp"))
        assert len(vecs) == 4
        assert all(np.isfinite(v).all() for v in vecs.values())

    def test_score_cosine_and_asnorm(self, artifact, eval_data, capsys):
        from voxsrc2020_speaker_verification_tpu.cli import score
        out, _ = artifact
        xv = os.path.join(eval_data, "xvector.scp")
        trials = os.path.join(eval_data, "trials")
        score.main(["--trials", trials, "--xvectors", xv])
        assert "cosine: EER" in capsys.readouterr().out
        score.main([
            "--trials", trials, "--xvectors", xv,
            "--cohort-xvectors", xv,
            "--cohort-spk2utt", os.path.join(eval_data, "spk2utt"),
            "--topk", "2",
            "--out", os.path.join(eval_data, "scores.txt"),
        ])
        assert "asnorm-top2: EER" in capsys.readouterr().out
        assert sum(1 for _ in open(os.path.join(eval_data, "scores.txt"))) == 4

    def test_score_with_projection_cohort(self, artifact, eval_data, capsys):
        from voxsrc2020_speaker_verification_tpu.cli import score
        out, _ = artifact
        score.main([
            "--trials", os.path.join(eval_data, "trials"),
            "--xvectors", os.path.join(eval_data, "xvector.scp"),
            "--cohort-weights", os.path.join(out, "projection_weight.pkl"),
            "--topk", "3",
        ])
        assert "asnorm-top3: EER" in capsys.readouterr().out

    def test_extract_host_cmvn_matches_device(self, artifact, eval_data,
                                              tmp_path):
        """--cmvn host (sliding_cmn_np on the host, one link crossing)
        must produce the same embeddings as the default device CMVN path
        (cmvn_full_stream round trip)."""
        from voxsrc2020_speaker_verification_tpu.cli import extract
        out, _ = artifact
        prefixes = {}
        for mode in ("device", "host"):
            prefixes[mode] = str(tmp_path / f"xv_{mode}")
            extract.main(["--artifact", out, "--data-dir", eval_data,
                          "--out", prefixes[mode], "--batch-size", "4",
                          "--cmvn", mode])
        dev = dict(kaldi_io.read_vec_flt_scp(prefixes["device"] + ".scp"))
        host = dict(kaldi_io.read_vec_flt_scp(prefixes["host"] + ".scp"))
        assert dev.keys() == host.keys() and len(dev) == 4
        for u in dev:
            np.testing.assert_allclose(host[u], dev[u], atol=1e-4)

    @pytest.mark.parametrize("wire", ["float32", "bfloat16"])
    def test_evaluate_cli_end_to_end(self, artifact, eval_data, tmp_path,
                                     capsys, wire):
        """cli.evaluate (the eval_inference_model.sh replacement) end to end:
        extract through the requested wire + cosine/asnorm score + report.
        --out-dir forces a fresh extraction so the bf16 wire leg actually
        exercises the wire, rather than reusing test_extract's fp32 vecs."""
        from voxsrc2020_speaker_verification_tpu.cli import evaluate
        out, _ = artifact
        evaluate.main([
            "--artifact", out,
            "--test-dir", eval_data,
            "--trials", f"tiny={os.path.join(eval_data, 'trials')}",
            "--cohort-weights", os.path.join(out, "projection_weight.pkl"),
            "--out-dir", str(tmp_path / wire),
            "--topk", "3", "--batch-size", "4",
            "--wire", wire,
        ])
        line = capsys.readouterr().out
        assert "[tiny] cosine: EER" in line and "asnorm: EER" in line
        scps = list((tmp_path / wire).glob("xvector_*.scp"))
        assert len(scps) == 1, scps
        vecs = dict(kaldi_io.read_vec_flt_scp(str(scps[0])))
        assert len(vecs) == 4 and all(np.isfinite(v).all()
                                      for v in vecs.values())
