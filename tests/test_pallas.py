"""Pallas kernel parity tests (interpret mode on the CPU test platform;
the same kernels compile natively on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from voxsrc2020_speaker_verification_tpu.ops.fbank import (
    FbankConfig, fbank, num_frames,
)
from voxsrc2020_speaker_verification_tpu.ops.pallas import (
    fbank_fused, frames_from_wave2d,
)


class TestFramingIdentity:
    def test_matches_gather(self):
        shift, length = 160, 400
        t = 10
        s = (t - 1) * shift + length
        wave = np.arange(s, dtype=np.float32)
        rows = t + 2  # t + ceil(400/160) - 1
        w2 = np.pad(wave, (0, rows * shift - s)).reshape(rows, shift)
        got = np.asarray(frames_from_wave2d(jnp.asarray(w2), t, shift, length))
        want = np.stack([wave[i * shift: i * shift + length] for i in range(t)])
        np.testing.assert_array_equal(got, want)


class TestFbankFused:
    @pytest.mark.parametrize("feat_dim", [40, 80])
    def test_parity_with_xla_path(self, feat_dim):
        cfg = FbankConfig(num_bins=feat_dim)
        rng = np.random.RandomState(0)
        waves = (rng.randn(2, 2 * 16000) * 3000).astype(np.float32)
        want = np.asarray(fbank(waves, cfg))
        got = np.asarray(fbank_fused(waves, cfg, interpret=True))
        assert got.shape == want.shape == (2, num_frames(2 * 16000, cfg), feat_dim)
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-5)

    def test_non_tile_multiple_length(self):
        # T = 298 frames: not a multiple of T_TILE=256 -> masked tail
        cfg = FbankConfig(num_bins=40)
        rng = np.random.RandomState(1)
        s = 297 * 160 + 400
        waves = (rng.randn(1, s) * 2000).astype(np.float32)
        want = np.asarray(fbank(waves, cfg))
        got = np.asarray(fbank_fused(waves, cfg, interpret=True))
        assert got.shape[1] == 298
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-5)

    def test_single_wave_rank1(self):
        cfg = FbankConfig(num_bins=40)
        wave = (np.random.RandomState(2).randn(16000) * 1000).astype(np.float32)
        got = np.asarray(fbank_fused(wave, cfg, interpret=True))
        want = np.asarray(fbank(wave, cfg))
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-5)
