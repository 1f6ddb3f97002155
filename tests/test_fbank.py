"""FBANK numerics vs an independent per-frame numpy implementation of the
Kaldi algorithm (feature-window.cc / mel-computations.cc semantics, written
step-by-step rather than as fused matmuls) plus structural properties."""

import numpy as np
import pytest

from voxsrc2020_speaker_verification_tpu.ops import fbank as fb


def kaldi_fbank_numpy(wave: np.ndarray, cfg: fb.FbankConfig) -> np.ndarray:
    """Direct per-frame float64 reference: dither-free Kaldi fbank."""
    n = cfg.frame_length
    shift = cfg.frame_shift
    padded = cfg.padded_frame_length
    window = fb.feature_window(cfg)
    mel = fb.mel_banks(cfg)  # (num_fft_bins, num_bins)
    num_fft_bins = padded // 2

    t = fb.num_frames(len(wave), cfg)
    out = np.zeros((t, cfg.num_bins))
    for i in range(t):
        frame = wave[i * shift: i * shift + n].astype(np.float64).copy()
        if cfg.remove_dc_offset:
            frame -= frame.mean()
        if cfg.preemph_coeff:
            p = cfg.preemph_coeff
            frame[1:] -= p * frame[:-1].copy()
            frame[0] -= p * frame[0]
        frame *= window
        spec = np.fft.rfft(frame, padded)
        power = (spec.real ** 2 + spec.imag ** 2)[:num_fft_bins]
        energies = power @ mel
        out[i] = np.log(np.maximum(energies, fb.FLT_EPSILON))
    return out


@pytest.fixture(scope="module")
def wave():
    rng = np.random.RandomState(0)
    # int16-scale speech-ish signal: tone mixture + noise
    t = np.arange(16000 * 2) / 16000.0
    sig = (
        3000 * np.sin(2 * np.pi * 220 * t)
        + 1500 * np.sin(2 * np.pi * 1330 * t + 0.7)
        + 200 * rng.randn(len(t))
    )
    return np.clip(sig, -32768, 32767).astype(np.float32)


@pytest.mark.parametrize("num_bins", [80, 40])
def test_fbank_matches_numpy_reference(wave, num_bins):
    cfg = fb.FbankConfig(num_bins=num_bins, dither=0.0)
    got = np.asarray(fb.fbank(wave, cfg))
    want = kaldi_fbank_numpy(wave, cfg)
    assert got.shape == want.shape == (fb.num_frames(len(wave), cfg), num_bins)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-3)


def test_frame_count_snip_edges():
    cfg = fb.FbankConfig()
    assert fb.num_frames(399, cfg) == 0
    assert fb.num_frames(400, cfg) == 1
    assert fb.num_frames(559, cfg) == 1
    assert fb.num_frames(560, cfg) == 2
    assert fb.num_frames(32000, cfg) == 1 + (32000 - 400) // 160


def test_batched_matches_single(wave):
    cfg = fb.FbankConfig(dither=0.0)
    w2 = np.stack([wave, wave[::-1].copy()])
    batched = np.asarray(fb.fbank(w2, cfg))
    single0 = np.asarray(fb.fbank(wave, cfg))
    single1 = np.asarray(fb.fbank(wave[::-1].copy(), cfg))
    np.testing.assert_allclose(batched[0], single0, rtol=1e-6)
    np.testing.assert_allclose(batched[1], single1, rtol=1e-6)


def test_tone_peaks_at_expected_mel_bin(wave):
    cfg = fb.FbankConfig(dither=0.0)
    feats = np.asarray(fb.fbank(wave, cfg)).mean(axis=0)
    # 220 Hz: mel bin whose center is closest should dominate the low range
    centers_mel = fb.mel_scale(20) + (np.arange(80) + 1) * (
        (fb.mel_scale(8000) - fb.mel_scale(20)) / 81
    )
    centers_hz = 700 * (np.exp(centers_mel / 1127) - 1)
    lowband = feats[:20]
    peak_bin = int(np.argmax(lowband))
    assert abs(centers_hz[peak_bin] - 220) < 100


def test_dither_changes_output_but_is_small(wave):
    import jax
    cfg = fb.FbankConfig(dither=1.0)
    clean = np.asarray(fb.fbank(wave, cfg))
    dithered = np.asarray(fb.fbank(wave, cfg, dither_key=jax.random.PRNGKey(0)))
    assert not np.allclose(clean, dithered)
    # dither is 1 LSB of int16 -- tiny vs the signal
    assert np.abs(clean - dithered).mean() < 0.5


def test_high_freq_negative_offset():
    """high_freq <= 0 is an offset from Nyquist (Kaldi convention); the mel
    bank must span [low, nyquist + high_freq] and stay in range."""
    import numpy as np
    from voxsrc2020_speaker_verification_tpu.ops.fbank import (
        FbankConfig, mel_banks, fbank,
    )
    cfg = FbankConfig(num_bins=40, high_freq=-400.0, dither=0.0)
    m = mel_banks(cfg)
    assert m.shape == (256, 40) and np.isfinite(m).all()
    # bins at/above nyquist-400 Hz get no weight
    fft_freqs = cfg.sample_rate / cfg.padded_frame_length * np.arange(256)
    assert m[fft_freqs >= 8000 - 400].sum() == 0.0
    wave = (1000 * np.sin(0.05 * np.arange(8000))).astype(np.float32)
    out = np.asarray(fbank(wave[None], cfg))
    assert np.isfinite(out).all()


def test_high_freq_invalid_rejected():
    import numpy as np
    import pytest
    from voxsrc2020_speaker_verification_tpu.ops.fbank import (
        FbankConfig, mel_banks,
    )
    with pytest.raises(AssertionError):
        mel_banks(FbankConfig(num_bins=40, high_freq=9000.0))  # > nyquist
    with pytest.raises(AssertionError):
        mel_banks(FbankConfig(num_bins=40, low_freq=7900.0, high_freq=-200.0))


def test_padded_garbage_frame_contract():
    """fbank() on padded waveforms: frames past num_frames(true_len) are
    garbage BY CONTRACT and must be masked downstream; frames before it
    must equal the unpadded computation exactly."""
    import numpy as np
    from voxsrc2020_speaker_verification_tpu.ops.fbank import (
        FbankConfig, fbank, num_frames, num_frames_batch,
    )
    cfg = FbankConfig(num_bins=40, dither=0.0)
    rng = np.random.RandomState(0)
    true_len = 9600
    wave = (3000 * rng.randn(true_len)).astype(np.float32)
    padded = np.zeros(16000, np.float32)
    padded[:true_len] = wave
    t = num_frames(true_len, cfg)
    assert int(num_frames_batch(np.asarray([true_len]), cfg)[0]) == t
    a = np.asarray(fbank(wave[None], cfg))[0]
    b = np.asarray(fbank(padded[None], cfg))[0]
    np.testing.assert_array_equal(b[:t], a[:t])
    assert b.shape[0] > t  # garbage tail exists -> masking is mandatory
