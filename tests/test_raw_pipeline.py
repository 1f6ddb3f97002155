"""Raw-audio pipeline parity: on-device FBANK+CMVN on context-carrying
waveform crops must reproduce the reference's offline pipeline exactly
(full-utterance fbank -> full-utterance sliding CMVN -> feature crop,
ref tf_data.py:84-101 + apply-cmvn-sliding semantics)."""

import numpy as np
import pytest

from voxsrc2020_speaker_verification_tpu.ops.cmvn import sliding_cmvn
from voxsrc2020_speaker_verification_tpu.ops.fbank import FbankConfig, fbank, num_frames
from voxsrc2020_speaker_verification_tpu.ops.pipeline import (
    crop_samples, max_crop_samples, waveform_to_features,
)

CFG = FbankConfig(num_bins=40, dither=0.0)
L = 20  # feat_length
CONTEXT = 15
WINDOW = 30  # small CMVN window so edge cases are cheap to exercise


def reference_features(samples, t0):
    """Offline path: full fbank -> full sliding CMVN -> crop rows."""
    feats = np.asarray(fbank(samples[None].astype(np.float32), CFG))[0]
    feats = np.asarray(sliding_cmvn(feats[None], window=WINDOW, center=True))[0]
    return feats[t0: t0 + L]


def raw_path(samples, t0):
    """Online path: context crop on host -> device pipeline."""
    n = num_frames(len(samples), CFG)
    lo = max(0, t0 - CONTEXT)
    hi = min(n, t0 + L + CONTEXT)
    s_lo = lo * CFG.frame_shift
    s_hi = min(len(samples), (hi - 1) * CFG.frame_shift + CFG.frame_length)
    crop = samples[s_lo:s_hi]
    smax = max_crop_samples(L, CONTEXT, CFG)
    wave = np.zeros(smax, np.float32)
    wave[: len(crop)] = crop
    out = waveform_to_features(
        wave[None], np.array([len(crop)], np.int32),
        np.array([t0 - lo], np.int32), np.array([0], np.int32),
        CFG, L, window=WINDOW, context=CONTEXT,
    )
    return np.asarray(out)[0]


@pytest.fixture(scope="module")
def wave():
    rng = np.random.RandomState(0)
    n_frames = 80
    s = (n_frames - 1) * CFG.frame_shift + CFG.frame_length
    return (rng.randn(s) * 2000).astype(np.float32)


class TestRawParity:
    @pytest.mark.parametrize("t0", [0, 3, 30, 45, 60])
    def test_crop_positions(self, wave, t0):
        # 80-frame utterance, crops at the start, interior, and end;
        # includes positions where the CMVN window clips at either edge
        want = reference_features(wave, t0)
        got = raw_path(wave, t0)
        np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)

    def test_short_utterance_zero_pad(self):
        rng = np.random.RandomState(1)
        n = 12  # < L frames
        s = (n - 1) * CFG.frame_shift + CFG.frame_length
        samples = (rng.randn(s) * 2000).astype(np.float32)
        feats = np.asarray(fbank(samples[None].astype(np.float32), CFG))[0]
        feats = np.asarray(sliding_cmvn(feats[None], window=WINDOW))[0]
        shift = 5
        want = np.zeros((L, CFG.num_bins), np.float32)
        want[shift: shift + n] = feats

        smax = max_crop_samples(L, CONTEXT, CFG)
        wave = np.zeros(smax, np.float32)
        wave[: len(samples)] = samples
        got = np.asarray(waveform_to_features(
            wave[None], np.array([len(samples)], np.int32),
            np.array([0], np.int32), np.array([shift], np.int32),
            CFG, L, window=WINDOW, context=CONTEXT,
        ))[0]
        np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


class TestRawDataset:
    def test_stream_and_feeder(self, tmp_path):
        from voxsrc2020_speaker_verification_tpu.data import BatchFeeder, audio
        from voxsrc2020_speaker_verification_tpu.data.raw_dataset import (
            RawAudioShardDataset,
        )
        from voxsrc2020_speaker_verification_tpu.utils import datadir

        rng = np.random.RandomState(2)
        wav, utt2id = {}, {}
        for i in range(4):
            p = str(tmp_path / f"u{i}.wav")
            audio.write_wav(p, (rng.randn(6000 + 4000 * i) * 2000).astype(np.float32))
            wav[f"u{i}"] = p
            utt2id[f"u{i}"] = i % 2
        scp = str(tmp_path / "wav.scp")
        datadir.write_two_column(scp, wav)

        ds = RawAudioShardDataset(scp, utt2id, L, cfg=CFG, context=CONTEXT,
                                  skip_percent=0, seed=3)
        (wave, ns, off, shift), label = next(iter(ds))
        assert wave.shape == (max_crop_samples(L, CONTEXT, CFG),)
        assert int(ns) > 0 and label in (0, 1)

        feeder = BatchFeeder([ds], batch_size=2, num_accumulation_steps=2).start()
        try:
            feats, labels = feeder.get(timeout=10)
            assert isinstance(feats, tuple) and len(feats) == 4
            assert feats[0].shape[:2] == (2, 2) and labels.shape == (2, 2)
        finally:
            feeder.stop()

    def test_train_step_raw_mode(self):
        import jax
        from voxsrc2020_speaker_verification_tpu.training import (
            TrainConfig, create_train_state, make_train_step,
        )
        config = TrainConfig(
            model="tdnn", projection="sc_cm_linear", num_classes=4,
            dataset_length=32, feat_dim=40, feat_length=L,
            batch_size=2, num_accumulation_steps=2, bf16=False,
            raw_audio=True, dither=1.0, cmn_window=WINDOW, cmn_context=CONTEXT,
        )
        state = create_train_state(config, jax.random.PRNGKey(0))
        step = jax.jit(make_train_step(config), donate_argnums=0)
        rng = np.random.RandomState(4)
        smax = max_crop_samples(L, CONTEXT, CFG)
        feats = (
            (rng.randn(2, 2, smax) * 1000).astype(np.float32),
            np.full((2, 2), smax, np.int32),
            np.full((2, 2), CONTEXT, np.int32),
            np.zeros((2, 2), np.int32),
        )
        labels = rng.randint(0, 4, (2, 2)).astype(np.int32)
        state, metrics = step(state, feats, labels, jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["loss"]))
        assert int(state.step) == 1
