"""Sliding CMVN vs a direct per-frame loop implementation of Kaldi's
SlidingWindowCmn (center=true) semantics."""

import numpy as np
import pytest

from voxsrc2020_speaker_verification_tpu.ops.cmvn import sliding_cmvn, global_cmvn


def sliding_cmvn_loop(feat: np.ndarray, window=300, norm_vars=False) -> np.ndarray:
    """Direct loop: Kaldi slidingWindowCmn center=true clamped window."""
    n = len(feat)
    out = np.zeros_like(feat, dtype=np.float64)
    x = feat.astype(np.float64)
    for t in range(n):
        start = t - window // 2
        end = start + window
        if start < 0:
            end -= start
            start = 0
        if end > n:
            start -= end - n
            end = n
            start = max(start, 0)
        win = x[start:end]
        out[t] = x[t] - win.mean(axis=0)
        if norm_vars:
            var = win.var(axis=0)
            out[t] /= np.sqrt(max(var.mean(), 1e-10))
    return out


@pytest.mark.parametrize("n", [5, 100, 300, 301, 1000])
def test_matches_loop(n):
    rng = np.random.RandomState(n)
    feat = rng.randn(n, 8).astype(np.float32) * 3 + 1.5
    got = np.asarray(sliding_cmvn(feat))
    want = sliding_cmvn_loop(feat)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_batched_with_padding():
    rng = np.random.RandomState(7)
    a = rng.randn(120, 4).astype(np.float32)
    b = rng.randn(450, 4).astype(np.float32)
    t = 512
    batch = np.zeros((2, t, 4), np.float32)
    batch[0, :120] = a
    batch[1, :450] = b
    out = np.asarray(sliding_cmvn(batch, np.array([120, 450])))
    np.testing.assert_allclose(out[0, :120], sliding_cmvn_loop(a), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(out[1, :450], sliding_cmvn_loop(b), rtol=1e-4, atol=1e-4)


def test_short_utterance_window_covers_all():
    # utterances shorter than the window: every frame sees the same mean
    rng = np.random.RandomState(1)
    feat = rng.randn(50, 3).astype(np.float32)
    out = np.asarray(sliding_cmvn(feat))
    want = feat - feat.mean(axis=0, keepdims=True)
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-5)


def test_global_cmvn():
    feat = np.ones((10, 4), np.float32) * 5
    out = np.asarray(global_cmvn(feat, np.full(4, 3.0), np.full(4, 2.0)))
    np.testing.assert_allclose(out, np.ones((10, 4)))
