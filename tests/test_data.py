"""Data layer: Kaldi ark/scp round-trips (incl. compressed CM), wav IO,
data-dir utilities, and the feeder pipeline."""

import io
import os
import pickle

import numpy as np
import pytest

from voxsrc2020_speaker_verification_tpu.data import kaldi_io, audio
from voxsrc2020_speaker_verification_tpu.data.dataset import (
    FeatureShardDataset, SyntheticDataset, BatchFeeder, shard_paths_for_host,
)
from voxsrc2020_speaker_verification_tpu.utils import datadir


def test_mat_roundtrip_float32():
    rng = np.random.RandomState(0)
    mat = rng.randn(17, 80).astype(np.float32)
    buf = io.BytesIO()
    kaldi_io.write_mat(buf, mat, key="utt1")
    buf.seek(0)
    items = list(kaldi_io.read_mat_ark(buf))
    assert len(items) == 1 and items[0][0] == "utt1"
    np.testing.assert_array_equal(items[0][1], mat)


def test_vec_roundtrip():
    vec = np.arange(256, dtype=np.float32)
    buf = io.BytesIO()
    kaldi_io.write_vec_flt(buf, vec, key="emb")
    buf.seek(0)
    (key, got), = list(kaldi_io.read_vec_flt_ark(buf))
    assert key == "emb"
    np.testing.assert_array_equal(got, vec)


def test_compressed_mat_roundtrip_accuracy():
    """CM is 8-bit quantization: reconstruction error must be a small
    fraction of the per-column range (fbank features survive this --
    it's how the whole reference corpus is stored)."""
    rng = np.random.RandomState(1)
    mat = (rng.randn(500, 40) * 3 + rng.randn(1, 40) * 10).astype(np.float32)
    buf = io.BytesIO()
    kaldi_io.write_mat(buf, mat, key="u", compress=True)
    buf.seek(0)
    (_, got), = list(kaldi_io.read_mat_ark(buf))
    assert got.shape == mat.shape
    err = np.abs(got - mat)
    col_range = mat.max(0) - mat.min(0)
    assert (err / col_range).max() < 0.02, (err / col_range).max()
    # middle quantiles get the fine 128-step segment: tighter there
    assert np.median(err / col_range) < 0.005


def test_multi_entry_ark_and_scp(tmp_path):
    rng = np.random.RandomState(2)
    mats = {f"utt{i:03d}": rng.randn(10 + i, 8).astype(np.float32) for i in range(5)}
    ark = str(tmp_path / "feats.ark")
    scp = str(tmp_path / "feats.scp")
    with kaldi_io.ArkScpWriter(ark, scp) as w:
        for k, m in mats.items():
            w.write(k, m)
    via_ark = dict(kaldi_io.read_mat_ark(ark))
    via_scp = dict(kaldi_io.read_mat_scp(scp))
    assert set(via_ark) == set(via_scp) == set(mats)
    for k in mats:
        np.testing.assert_array_equal(via_ark[k], mats[k])
        np.testing.assert_array_equal(via_scp[k], mats[k])


def test_scp_offset_random_access(tmp_path):
    ark = str(tmp_path / "x.ark")
    scp = str(tmp_path / "x.scp")
    with kaldi_io.ArkScpWriter(ark, scp) as w:
        w.write("a", np.zeros((3, 4), np.float32))
        w.write("b", np.ones((2, 4), np.float32))
    lines = open(scp).read().splitlines()
    # read only the second entry through its offset rxfile
    _, rx = lines[1].split(maxsplit=1)
    with kaldi_io.open_or_fd(rx) as fd:
        mat = kaldi_io.read_mat(fd)
    np.testing.assert_array_equal(mat, np.ones((2, 4), np.float32))


def test_wav_roundtrip(tmp_path):
    sig = (np.random.RandomState(0).randn(16000) * 1000).astype(np.float32)
    p = str(tmp_path / "a.wav")
    audio.write_wav(p, sig, 16000)
    got, sr = audio.read_wav(p)
    assert sr == 16000
    np.testing.assert_allclose(got, np.round(sig), atol=0.51)
    assert abs(audio.wav_duration(p) - 1.0) < 1e-6


def test_datadir_utils(tmp_path):
    d = str(tmp_path)
    utt2spk = {f"spk{i}_utt{j}": f"spk{i}" for i in range(3) for j in range(4)}
    datadir.write_two_column(os.path.join(d, "utt2spk"), utt2spk)
    datadir.write_two_column(
        os.path.join(d, "wav.scp"), {u: f"/wav/{u}.wav" for u in utt2spk}
    )
    datadir.write_spk2utt(
        os.path.join(d, "spk2utt"), datadir.utt2spk_to_spk2utt(utt2spk)
    )
    assert datadir.validate_data_dir(d) == []

    spks = sorted({s for s in utt2spk.values()})
    utt2id = datadir.build_utt2id(utt2spk, spks)
    assert utt2id["spk0_utt0"] == 0 and utt2id["spk2_utt3"] == 2
    assert all(isinstance(v, int) for v in utt2id.values())

    # corrupt then fix
    datadir.write_two_column(
        os.path.join(d, "wav.scp"), {u: f"/wav/{u}.wav" for u in list(utt2spk)[:-2]}
    )
    assert datadir.validate_data_dir(d) != []
    datadir.fix_data_dir(d)
    assert datadir.validate_data_dir(d) == []


def test_shard_scp(tmp_path):
    scp = str(tmp_path / "feats.scp")
    with open(scp, "w") as f:
        for i in range(10):
            f.write(f"utt{i} /x/{i}.ark:0\n")
    paths = datadir.shard_scp(scp, 4)
    assert len(paths) == 4
    sizes = [len(open(p).read().splitlines()) for p in paths]
    assert sum(sizes) == 10 and max(sizes) - min(sizes) <= 1
    host_paths = shard_paths_for_host(str(tmp_path), 4, 1, 2)
    assert host_paths == [f"{tmp_path}/4-split/feats.3.scp",
                          f"{tmp_path}/4-split/feats.4.scp"]


def test_split_scp_by_speaker():
    """Speaker-coherent split (ref utils/split_scp.pl --utt2spk mode):
    each speaker's utterances land in exactly one shard, shards stay
    utterance-balanced, and fewer speakers than shards is an error."""
    import pytest

    rng = np.random.RandomState(7)
    utt2spk, lines = {}, []
    for s in range(9):
        for u in range(int(rng.randint(1, 12))):
            utt = f"spk{s}_utt{u}"
            utt2spk[utt] = f"spk{s}"
            lines.append(f"{utt} /x/{utt}.ark:0")
    chunks = datadir.split_scp_lines_by_speaker(lines, 4, utt2spk)
    assert sum(len(c) for c in chunks) == len(lines)
    # coherence: no speaker spans two shards
    shard_of = {}
    for i, c in enumerate(chunks):
        for line in c:
            spk = utt2spk[line.split()[0]]
            assert shard_of.setdefault(spk, i) == i
    # balance: the perl's greedy loop guarantees no adjacent move improves;
    # with ~5.5 utts/spk the spread stays within one max speaker size
    sizes = [len(c) for c in chunks]
    max_spk = max(
        sum(1 for u in utt2spk.values() if u == f"spk{s}") for s in range(9))
    assert max(sizes) - min(sizes) <= max_spk
    with pytest.raises(ValueError):
        datadir.split_scp_lines_by_speaker(lines, 10, utt2spk)
    # shard_scp passthrough
    assert len(datadir.split_scp_lines_by_speaker(lines, 1, utt2spk)[0]) \
        == len(lines)


def test_feature_shard_dataset_and_feeder(tmp_path):
    rng = np.random.RandomState(3)
    ark = str(tmp_path / "f.ark")
    scp = str(tmp_path / "f.scp")
    utt2id = {}
    with kaldi_io.ArkScpWriter(ark, scp) as w:
        for i in range(12):
            t = rng.randint(20, 120)  # both shorter and longer than crop 50
            w.write(f"utt{i}", rng.randn(t, 16).astype(np.float32))
            utt2id[f"utt{i}"] = i % 4

    ds = FeatureShardDataset(scp, utt2id, feat_dim=16, feat_length=50, seed=0)
    it = iter(ds)
    for _ in range(20):  # crosses an epoch boundary -> reshuffle path
        feat, label = next(it)
        assert feat.shape == (50, 16) and feat.dtype == np.float32
        assert 0 <= int(label) < 4

    feeder = BatchFeeder([ds], batch_size=4, num_accumulation_steps=2).start()
    fb, lb = feeder.get(timeout=30)
    assert fb.shape == (2, 4, 50, 16) and lb.shape == (2, 4)
    feeder.stop()


def test_synthetic_dataset():
    ds = SyntheticDataset(feat_dim=8, feat_length=10, num_classes=5)
    feat, label = next(iter(ds))
    assert feat.shape == (10, 8) and 0 <= int(label) < 5


def test_eval_mode_terminates(tmp_path):
    ark = str(tmp_path / "e.ark")
    scp = str(tmp_path / "e.scp")
    with kaldi_io.ArkScpWriter(ark, scp) as w:
        for i in range(3):
            w.write(f"u{i}", np.zeros((30, 8), np.float32))
    ds = FeatureShardDataset(scp, {}, feat_dim=8, feat_length=20, training=False)
    items = list(ds)
    assert len(items) == 3
    # eval mode: no cropping, keys passed through as labels
    assert items[0][0].shape == (30, 8) and items[0][1] == "u0"


class TestDataDirCopySubset:
    def test_copy_with_suffix(self, tmp_path):
        from voxsrc2020_speaker_verification_tpu.utils import datadir
        import os
        src = str(tmp_path / "src"); dst = str(tmp_path / "dst")
        os.makedirs(src)
        datadir.write_two_column(os.path.join(src, "wav.scp"),
                                 {"a": "/w/a.wav", "b": "/w/b.wav"})
        datadir.write_two_column(os.path.join(src, "utt2spk"),
                                 {"a": "s1", "b": "s2"})
        datadir.copy_data_dir(src, dst, utt_suffix="-reverb")
        wav = datadir.read_two_column(os.path.join(dst, "wav.scp"))
        assert set(wav) == {"a-reverb", "b-reverb"}
        u2s = datadir.read_two_column(os.path.join(dst, "utt2spk"))
        assert u2s["a-reverb"] == "s1"
        s2u = datadir.read_spk2utt(os.path.join(dst, "spk2utt"))
        assert s2u["s2"] == ["b-reverb"]

    def test_subset(self, tmp_path):
        from voxsrc2020_speaker_verification_tpu.utils import datadir
        import os
        src = str(tmp_path / "src"); dst = str(tmp_path / "sub")
        os.makedirs(src)
        datadir.write_two_column(os.path.join(src, "wav.scp"),
                                 {f"u{i}": f"/w/{i}.wav" for i in range(4)})
        datadir.write_two_column(os.path.join(src, "utt2spk"),
                                 {f"u{i}": f"s{i % 2}" for i in range(4)})
        datadir.subset_data_dir(src, dst, ["u0", "u3"])
        assert set(datadir.read_two_column(os.path.join(dst, "wav.scp"))) == {"u0", "u3"}
        assert datadir.validate_data_dir(dst) == []


def test_sliding_cmn_np_matches_device_op():
    from voxsrc2020_speaker_verification_tpu.data.dataset import sliding_cmn_np
    from voxsrc2020_speaker_verification_tpu.ops.cmvn import sliding_cmvn
    rng = np.random.RandomState(0)
    for t in (5, 80, 299, 300, 301, 700):
        feat = rng.randn(t, 12).astype(np.float32) * 3
        want = np.asarray(sliding_cmvn(feat, window=300, center=True))
        got = sliding_cmn_np(feat, window=300)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5), t


def test_feature_dataset_applies_sliding_cmn(tmp_path):
    """Training features go through the full-utterance sliding-CMN window
    BEFORE cropping, like the reference's apply-cmvn-sliding feeder pipe
    (ref tf_train_tdnn.py:83)."""
    from voxsrc2020_speaker_verification_tpu.data.dataset import sliding_cmn_np
    rng = np.random.RandomState(1)
    ark, scp = str(tmp_path / "c.ark"), str(tmp_path / "c.scp")
    raw = rng.randn(70, 8).astype(np.float32) + 5.0
    with kaldi_io.ArkScpWriter(ark, scp) as w:
        w.write("u0", raw)
    ds = FeatureShardDataset(scp, {}, feat_dim=8, feat_length=20,
                             training=False)
    feat, _ = next(iter(ds))
    np.testing.assert_allclose(feat, sliding_cmn_np(raw), rtol=1e-6)
    # opt-out restores the raw passthrough
    ds2 = FeatureShardDataset(scp, {}, feat_dim=8, feat_length=20,
                              training=False, sliding_cmn=False)
    feat2, _ = next(iter(ds2))
    np.testing.assert_array_equal(feat2, raw)


def test_feeder_bf16_wire(tmp_path):
    import ml_dtypes
    ds = SyntheticDataset(feat_dim=8, feat_length=10, num_classes=5)
    feeder = BatchFeeder([ds], batch_size=4, num_accumulation_steps=2,
                         wire_bf16=True).start()
    fb, lb = feeder.get(timeout=30)
    feeder.stop()
    assert fb.dtype == ml_dtypes.bfloat16 and fb.shape == (2, 4, 10, 8)
    assert lb.dtype == np.int32

    # a bf16-wire batch drives the jitted train step end to end
    import jax
    from voxsrc2020_speaker_verification_tpu.training import (
        TrainConfig, create_train_state, make_train_step,
    )
    cfg = TrainConfig(model="tdnn", projection="sc_cm_linear", num_classes=5,
                      dataset_length=64, feat_dim=8, feat_length=10,
                      batch_size=4, num_accumulation_steps=2, bf16=True,
                      specaug=True)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(cfg), donate_argnums=0)
    state, m = step(state, fb, lb, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss"]))
