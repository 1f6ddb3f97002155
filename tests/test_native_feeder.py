"""Native C++ batch feeder (native/vox_feeder.cc via NativeBatchFeeder).

The Python pipeline (data/dataset.py: FeatureShardDataset + BatchFeeder) is
the reference implementation; the native feeder must reproduce its
semantics -- sliding CMN, crop/pad bounds, label wiring, skip reshuffle,
bf16 wire -- not its RNG stream (batch composition is nondeterministic in
both, like the reference's multiprocess feeders, ref
tf_train_tdnn.py:151-164).
"""

import numpy as np
import pytest

from voxsrc2020_speaker_verification_tpu.data import kaldi_io, native
from voxsrc2020_speaker_verification_tpu.data.dataset import sliding_cmn_np

pytestmark = pytest.mark.skipif(
    not native.available() or not hasattr(native.get_lib(), "vox_feeder_create"),
    reason="native feeder unavailable",
)

FEAT_DIM = 8


def _make_corpus(tmp_path, lengths, compress=False, scale=1.0):
    """Write one ark/scp of len(lengths) utterances; per-utterance content is
    a recognizable constant row so crops can be attributed to utterances."""
    rng = np.random.RandomState(7)
    mats, utt2id = {}, {}
    base = str(tmp_path / "feats")
    with kaldi_io.ArkScpWriter(base + ".ark", base + ".scp",
                               compress=compress) as w:
        for i, t in enumerate(lengths):
            key = f"utt{i:03d}"
            m = (rng.randn(t, FEAT_DIM) * scale).astype(np.float32)
            # channel 0 carries index+1 so crops are traceable and nonzero
            # (zero padding stays distinguishable)
            m[:, 0] = i + 1
            mats[key] = m
            utt2id[key] = i % 3
            w.write(key, m)
    return base + ".scp", mats, utt2id


def test_shapes_labels_and_membership(tmp_path):
    scp, mats, utt2id = _make_corpus(tmp_path, [50, 120, 80, 200, 30])
    feeder = native.NativeBatchFeeder(
        scp, utt2id, FEAT_DIM, feat_length=64, batch_size=4,
        num_accumulation_steps=2, num_threads=2, seed=1,
        sliding_cmn=False, skip_percent=0)
    try:
        for _ in range(5):
            feats, labels = feeder.get()
            assert feats.shape == (2, 4, 64, FEAT_DIM)
            assert feats.dtype == np.float32
            assert labels.shape == (2, 4)
            for a in range(2):
                for b in range(4):
                    col = feats[a, b, :, 0]
                    assert col.any()
                    idx = int(col[np.nonzero(col)[0][0]]) - 1
                    key = f"utt{idx:03d}"
                    assert labels[a, b] == utt2id[key]
        assert feeder.decode_errors() == 0
    finally:
        feeder.close()


def test_crop_content_matches_source(tmp_path):
    """Every emitted window must be a contiguous slice of the source
    utterance (long case) or the zero-padded whole utterance (short case),
    matching FeatureCropper (ref tf_data.py:84-101)."""
    scp, mats, utt2id = _make_corpus(tmp_path, [40, 100])
    L = 64
    feeder = native.NativeBatchFeeder(
        scp, utt2id, FEAT_DIM, feat_length=L, batch_size=2,
        num_accumulation_steps=1, num_threads=1, seed=3,
        sliding_cmn=False, skip_percent=0)
    try:
        for _ in range(8):
            feats, _ = feeder.get()
            for b in range(2):
                win = feats[0, b]
                idx = int(win[np.nonzero(win[:, 0])[0][0], 0]) - 1
                src = mats[f"utt{idx:03d}"]
                t = src.shape[0]
                if t < L:  # zero-pad: utterance intact at some shift
                    nz = np.nonzero(win[:, 0])[0]
                    shift = nz[0]
                    assert nz[-1] - shift + 1 == t
                    np.testing.assert_array_equal(win[shift:shift + t], src)
                    assert not win[:shift].any()
                    assert not win[shift + t:].any()
                else:  # crop: contiguous slice
                    matched = any(
                        np.array_equal(win, src[s:s + L])
                        for s in range(t - L + 1))
                    assert matched
    finally:
        feeder.close()


def test_sliding_cmn_matches_python(tmp_path):
    """With feat_length == utterance length the crop is the identity, so the
    emitted features must equal sliding_cmn_np of the source exactly."""
    T = 90
    scp, mats, utt2id = _make_corpus(tmp_path, [T, T, T], scale=2.0)
    feeder = native.NativeBatchFeeder(
        scp, utt2id, FEAT_DIM, feat_length=T, batch_size=3,
        num_accumulation_steps=1, num_threads=1, seed=0,
        sliding_cmn=True, cmn_window=30, skip_percent=0)
    try:
        feats, _ = feeder.get()
        # CMN shifts channel 0, so identify each batch row by best match
        # against the CMN'd candidates
        want = [sliding_cmn_np(m, 30) for m in mats.values()]
        for b in range(3):
            diffs = [np.abs(feats[0, b] - w).max() for w in want]
            assert min(diffs) < 1e-5, diffs
    finally:
        feeder.close()


def test_cm_compressed_source(tmp_path):
    scp, mats, utt2id = _make_corpus(tmp_path, [70, 70], compress=True)
    feeder = native.NativeBatchFeeder(
        scp, utt2id, FEAT_DIM, feat_length=70, batch_size=2,
        num_accumulation_steps=1, num_threads=1, seed=0,
        sliding_cmn=False, skip_percent=0)
    try:
        feats, _ = feeder.get()
        # CM decode through the feeder == CM decode through the reader
        decoded = dict(kaldi_io.read_mat_scp(scp, use_native=False))
        for b in range(2):
            diffs = [np.abs(feats[0, b] - d).max() for d in decoded.values()]
            assert min(diffs) == 0.0
    finally:
        feeder.close()


def test_bf16_wire_matches_ml_dtypes(tmp_path):
    import ml_dtypes

    T = 48
    scp, mats, utt2id = _make_corpus(tmp_path, [T], scale=3.7)
    feeder = native.NativeBatchFeeder(
        scp, utt2id, FEAT_DIM, feat_length=T, batch_size=1,
        num_accumulation_steps=1, num_threads=1, seed=0,
        sliding_cmn=False, skip_percent=0, wire_bf16=True)
    try:
        feats, _ = feeder.get()
        assert feats.dtype == np.dtype(ml_dtypes.bfloat16)
        want = mats["utt000"].astype(ml_dtypes.bfloat16)
        np.testing.assert_array_equal(
            feats[0, 0].view(np.uint16), want.view(np.uint16))
    finally:
        feeder.close()


def test_skip_percent_reshuffle(tmp_path):
    """With skip_percent=50 over a single-utterance corpus the feeder still
    makes progress (skips retry on the next pass) and batches remain full."""
    scp, mats, utt2id = _make_corpus(tmp_path, [64])
    feeder = native.NativeBatchFeeder(
        scp, utt2id, FEAT_DIM, feat_length=64, batch_size=2,
        num_accumulation_steps=2, num_threads=1, seed=5,
        sliding_cmn=False, skip_percent=50)
    try:
        feats, labels = feeder.get()
        assert feats.shape == (2, 2, 64, FEAT_DIM)
        assert (labels == utt2id["utt000"]).all()
    finally:
        feeder.close()


def test_stop_unblocks_and_destroy_joins(tmp_path):
    scp, mats, utt2id = _make_corpus(tmp_path, [64, 64])
    feeder = native.NativeBatchFeeder(
        scp, utt2id, FEAT_DIM, feat_length=64, batch_size=2,
        num_accumulation_steps=1, num_threads=2, seed=0, skip_percent=0)
    feeder.get()
    feeder.stop()
    with pytest.raises(StopIteration):
        while True:
            feeder.get()  # drains queued samples, then raises
    feeder.close()


def test_train_cli_uses_native_feeder(tmp_path, monkeypatch, capsys):
    """cli.train's precomputed-feature path runs on the C++ feeder end to
    end (tiny data dir, one optimizer step on the CPU mesh)."""
    import pickle

    from voxsrc2020_speaker_verification_tpu.cli import train as cli_train
    from voxsrc2020_speaker_verification_tpu.recipes import get_recipe

    config, _ = get_recipe("tdnn_voxsrc2020_vox2_dev")
    data_dir = tmp_path / "data" / config.dataset
    split = data_dir / "2-split"
    split.mkdir(parents=True)
    rng = np.random.RandomState(0)
    utt2id = {}
    for s in range(2):
        ark = str(split / f"feats.{s + 1}.ark")
        scp = str(split / f"feats.{s + 1}.scp")
        with kaldi_io.ArkScpWriter(ark, scp) as w:
            for i in range(6):
                key = f"u{s}_{i}"
                w.write(key, rng.randn(30, config.feat_dim).astype(np.float32))
                utt2id[key] = (s * 6 + i) % 3
    with open(data_dir / "utt2id.pkl", "wb") as f:
        pickle.dump(utt2id, f)

    monkeypatch.chdir(tmp_path)
    cli_train.main([
        "--recipe", "tdnn_voxsrc2020_vox2_dev", "--data-root", "data",
        "--num-shards", "2", "--num-workers", "2",
        "--max-steps", "1", "--log-every", "0", "--no-checkpoint",
        "--batch-size", "4", "--num-accumulation-steps", "1",
        "--feat-length", "24",
    ])
    assert "done: 1 steps" in capsys.readouterr().out


def test_close_races_concurrent_get(tmp_path):
    """close() while another thread is blocked inside vox_feeder_next must
    not use-after-free the C++ object (the training loop's device_prefetch
    worker does exactly this when the main thread tears the feeder down)."""
    import threading

    scp, mats, utt2id = _make_corpus(tmp_path, [64, 80, 120])
    for trial in range(10):
        feeder = native.NativeBatchFeeder(
            scp, utt2id, FEAT_DIM, feat_length=64, batch_size=8,
            num_accumulation_steps=4, num_threads=2, seed=trial,
            skip_percent=0)
        n_got = [0]

        def consume():
            try:
                for _ in feeder:
                    n_got[0] += 1
            except Exception:
                pass

        t = threading.Thread(target=consume, daemon=True)
        t.start()
        feeder.get()  # main thread also consumes once
        feeder.close()
        t.join(timeout=10)
        assert not t.is_alive()


def test_all_shards_dead_raises(tmp_path):
    """A feature store whose dim mismatches --feat-dim must fail loudly,
    not hang: every worker's pass decodes nothing -> get() raises IOError
    naming the decode-error count."""
    scp, mats, utt2id = _make_corpus(tmp_path, [60, 60, 60])
    feeder = native.NativeBatchFeeder(
        scp, utt2id, FEAT_DIM + 1, feat_length=40, batch_size=2,
        num_accumulation_steps=1, num_threads=2, seed=0,
        sliding_cmn=False, skip_percent=0)
    try:
        with pytest.raises(IOError, match="failed to decode"):
            feeder.get()
        assert feeder.decode_errors() >= 3
    finally:
        feeder.close()


def test_cmvn_pkl_matches_python(tmp_path):
    """Global CMVN (ref tf_train_tdnn.py:91 cmvn_pkl, tf_data.py:80-81)
    through the native feeder == FeatureShardDataset's cmvn_pkl path:
    sliding CMN first, then (x - mean) / std."""
    import pickle

    from voxsrc2020_speaker_verification_tpu.data.dataset import (
        FeatureShardDataset,
    )

    T = 80
    scp, mats, utt2id = _make_corpus(tmp_path, [T], scale=2.0)
    rng = np.random.RandomState(11)
    mean = rng.randn(FEAT_DIM).astype(np.float32)
    std = (0.5 + rng.rand(FEAT_DIM)).astype(np.float32)
    pkl = str(tmp_path / "cmvn.pkl")
    with open(pkl, "wb") as f:
        pickle.dump((mean, std), f)

    # feat_length == T: the crop is the identity, outputs comparable exactly
    py = next(iter(FeatureShardDataset(
        scp, utt2id, FEAT_DIM, T, cmvn_pkl=pkl, skip_percent=0,
        sliding_cmn=True, cmn_window=30)))[0]
    feeder = native.NativeBatchFeeder(
        scp, utt2id, FEAT_DIM, feat_length=T, batch_size=1,
        num_accumulation_steps=1, num_threads=1, seed=0,
        sliding_cmn=True, cmn_window=30, skip_percent=0, cmvn_pkl=pkl)
    try:
        feats, _ = feeder.get()
        np.testing.assert_allclose(feats[0, 0], py, rtol=1e-6, atol=1e-6)
    finally:
        feeder.close()


def test_cmvn_pkl_keepdims_shapes_accepted(tmp_path):
    """(1, F) keepdims pickles broadcast in the Python path and must load
    in the native feeder too (round-3 review finding)."""
    import pickle

    T = 40
    scp, mats, utt2id = _make_corpus(tmp_path, [T])
    rng = np.random.RandomState(3)
    pkl = str(tmp_path / "cmvn_keepdims.pkl")
    mean = rng.randn(1, FEAT_DIM).astype(np.float32)
    std = (0.5 + rng.rand(1, FEAT_DIM)).astype(np.float32)
    with open(pkl, "wb") as f:
        pickle.dump((mean, std), f)
    feeder = native.NativeBatchFeeder(
        scp, utt2id, FEAT_DIM, feat_length=T, batch_size=1,
        num_accumulation_steps=1, num_threads=1, seed=0,
        sliding_cmn=False, skip_percent=0, cmvn_pkl=pkl)
    try:
        feats, _ = feeder.get()
        want = (mats["utt000"] - mean[0]) / std[0]
        np.testing.assert_allclose(feats[0, 0], want, rtol=1e-6, atol=1e-6)
    finally:
        feeder.close()
    # dimension mismatch fails loudly, not silently
    with open(pkl, "wb") as f:
        pickle.dump((np.zeros(FEAT_DIM + 2, np.float32),
                     np.ones(FEAT_DIM + 2, np.float32)), f)
    with pytest.raises(AssertionError, match="dims"):
        native.NativeBatchFeeder(
            scp, utt2id, FEAT_DIM, feat_length=T, batch_size=1,
            cmvn_pkl=pkl)


def test_partial_dead_shard_detected(tmp_path):
    """One corrupt shard out of two must NOT be silent: the feeder keeps
    producing from the live shard but reports the dead one via
    dead_shards() (the training loop fails loudly on it)."""
    good_scp, _, utt2id = _make_corpus(tmp_path, [60, 60, 60])
    bad_dir = tmp_path / "bad"
    bad_dir.mkdir()
    bad_base = str(bad_dir / "feats")
    bad_utt2id = {}
    with kaldi_io.ArkScpWriter(bad_base + ".ark", bad_base + ".scp") as w:
        for i in range(3):
            key = f"bad{i:03d}"
            # wrong feature dim: every decode in this shard fails
            w.write(key, np.zeros((60, FEAT_DIM + 3), np.float32))
            bad_utt2id[key] = 0
    feeder = native.NativeBatchFeeder(
        [good_scp, bad_base + ".scp"], {**utt2id, **bad_utt2id},
        FEAT_DIM, feat_length=40, batch_size=2,
        num_accumulation_steps=1, num_threads=2, seed=0,
        sliding_cmn=False, skip_percent=0)
    try:
        import time

        feats, _ = feeder.get()  # the live shard still produces
        assert feats.shape == (1, 2, 40, FEAT_DIM)
        deadline = time.time() + 10
        while feeder.dead_shards() == 0 and time.time() < deadline:
            feeder.get()
        assert feeder.dead_shards() == 1
        assert feeder.decode_errors() >= 3
    finally:
        feeder.close()


def test_training_loop_fails_on_dead_shard():
    """fit() raises on the first log interval when the feeder reports a
    dead shard (silent partial data loss, VERDICT round-2 weak #6)."""
    import pytest as _pytest

    from voxsrc2020_speaker_verification_tpu.training import TrainConfig
    from voxsrc2020_speaker_verification_tpu.training.loop import fit

    config = TrainConfig(
        model="tdnn", projection="linear", num_classes=4,
        dataset_length=64, feat_dim=8, feat_length=16,
        batch_size=2, num_accumulation_steps=1, total_epochs=2,
        bf16=False, exp_root="")

    class SickFeeder:
        """Duck-typed like NativeBatchFeeder: produces batches fine but
        reports one dead shard."""

        def __iter__(self):
            rng = np.random.RandomState(0)
            while True:
                yield (rng.randn(1, 2, 16, 8).astype(np.float32),
                       np.zeros((1, 2), np.int32))

        def decode_errors(self):
            return 7

        def dead_shards(self):
            return 1

    with _pytest.raises(IOError, match="decoded nothing over a full pass"):
        fit(config, SickFeeder(), log_every=1, max_steps=3,
            checkpoint=False, log_fn=lambda s: None)


def test_training_loop_fails_on_dead_shard_without_logging():
    """The dead-shard check must fire even with logging disabled
    (log_every=0) -- it used to live inside the logging block, so exactly
    the unattended runs lost the protection (round-3 review finding)."""
    import pytest as _pytest

    from voxsrc2020_speaker_verification_tpu.training import TrainConfig
    from voxsrc2020_speaker_verification_tpu.training.loop import fit

    config = TrainConfig(
        model="tdnn", projection="linear", num_classes=4,
        dataset_length=1024, feat_dim=8, feat_length=16,
        batch_size=2, num_accumulation_steps=1, total_epochs=2,
        bf16=False, exp_root="")

    class SickFeeder:
        def __iter__(self):
            rng = np.random.RandomState(0)
            while True:
                yield (rng.randn(1, 2, 16, 8).astype(np.float32),
                       np.zeros((1, 2), np.int32))

        def decode_errors(self):
            return 7

        def dead_shards(self):
            return 1

    # log_every=0 -> the check runs on its fallback 100-step cadence
    with _pytest.raises(IOError, match="decoded nothing over a full pass"):
        fit(config, SickFeeder(), log_every=0, max_steps=150,
            checkpoint=False, log_fn=lambda s: None)


def test_health_getters_safe_after_close(tmp_path):
    """decode_errors()/dead_shards() after close() must return 0, not pass
    a NULL handle into C (round-3 review finding: segfault)."""
    scp, mats, utt2id = _make_corpus(tmp_path, [40])
    feeder = native.NativeBatchFeeder(
        scp, utt2id, FEAT_DIM, feat_length=20, batch_size=1,
        num_accumulation_steps=1, num_threads=1, seed=0, skip_percent=0)
    feeder.get()
    feeder.close()
    assert feeder.decode_errors() == 0
    assert feeder.dead_shards() == 0


def test_rejects_piped_rspec(tmp_path):
    scp = tmp_path / "pipes.scp"
    scp.write_text("utt0 cat foo.ark |\n")
    with pytest.raises(ValueError, match="plain path:offset"):
        native.NativeBatchFeeder(
            str(scp), {"utt0": 0}, FEAT_DIM, 64, 2)
