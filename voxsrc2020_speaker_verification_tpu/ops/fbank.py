"""Kaldi-compatible log-mel FBANK, redesigned for the TPU MXU.

Numerically matches Kaldi ``compute-fbank-feats`` with the reference configs
(/root/reference/conf/fbank80.conf, fbank40.conf: --sample-frequency=16000,
--num-mel-bins={80,40}; all other Kaldi defaults implied -- 25 ms window,
10 ms shift, dither 1.0, preemphasis 0.97, remove-dc-offset, Povey window,
round-to-power-of-two 512-pt FFT, snip-edges, mel low 20 Hz high Nyquist,
log mel energies floored at FLT_EPSILON).

TPU-first design: every per-frame DSP step before the power spectrum is
*linear* in the frame samples --

    frame -> (+dither) -> remove-DC -> preemphasize -> window -> zero-pad
          -> real DFT

-- so the whole chain collapses into two constant matrices A, B of shape
(frame_length, num_fft_bins):

    power[k] = (x @ A)[k]^2 + (x @ B)[k]^2            (two MXU matmuls)
    fbank    = log(max(power @ MelT, eps))            (one MXU matmul)

This turns the reference's C++ scalar DSP (Kaldi feature-window.cc /
mel-computations.cc semantics) into three batched matmuls that tile onto the
128x128 systolic array, with no FFT op and no host round-trips.  The Nyquist
bin is never built: Kaldi's mel banks span fft bins [0, N/2), so A/B have
N/2 columns.

Waveform convention: float32 arrays in int16 scale (-32768..32767), exactly
what Kaldi reads from PCM wav -- required for bit-faithful dither/floor
behavior.
"""

from __future__ import annotations

import dataclasses
import math
from functools import lru_cache, partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# std::numeric_limits<float>::epsilon() -- Kaldi's mel-energy floor.
FLT_EPSILON = float(np.finfo(np.float32).eps)


@dataclasses.dataclass(frozen=True)
class FbankConfig:
    sample_rate: int = 16000
    num_bins: int = 80
    frame_length_ms: float = 25.0
    frame_shift_ms: float = 10.0
    low_freq: float = 20.0
    high_freq: float = 0.0  # <= 0: offset from Nyquist
    dither: float = 1.0
    preemph_coeff: float = 0.97
    remove_dc_offset: bool = True
    window_type: str = "povey"
    round_to_power_of_two: bool = True
    snip_edges: bool = True
    use_power: bool = True
    use_log_fbank: bool = True

    @property
    def frame_length(self) -> int:
        return int(self.sample_rate * 0.001 * self.frame_length_ms)

    @property
    def frame_shift(self) -> int:
        return int(self.sample_rate * 0.001 * self.frame_shift_ms)

    @property
    def padded_frame_length(self) -> int:
        if not self.round_to_power_of_two:
            return self.frame_length
        n = 1
        while n < self.frame_length:
            n *= 2
        return n


def num_frames(num_samples: int, cfg: FbankConfig) -> int:
    """Kaldi snip-edges frame count: 0 if fewer samples than one window."""
    if num_samples < cfg.frame_length:
        return 0
    return 1 + (num_samples - cfg.frame_length) // cfg.frame_shift


def feature_window(cfg: FbankConfig) -> np.ndarray:
    """Kaldi window functions (feature-window.cc FeatureWindowFunction)."""
    n = cfg.frame_length
    a = 2.0 * math.pi / (n - 1)
    i = np.arange(n, dtype=np.float64)
    if cfg.window_type == "povey":
        return (0.5 - 0.5 * np.cos(a * i)) ** 0.85
    if cfg.window_type == "hanning":
        return 0.5 - 0.5 * np.cos(a * i)
    if cfg.window_type == "hamming":
        return 0.54 - 0.46 * np.cos(a * i)
    if cfg.window_type == "rectangular":
        return np.ones(n)
    if cfg.window_type == "blackman":
        # Kaldi's blackman_coeff default 0.42.
        return 0.42 - 0.5 * np.cos(a * i) + 0.08 * np.cos(2 * a * i)
    raise ValueError(f"unknown window type {cfg.window_type}")


def mel_scale(freq):
    return 1127.0 * np.log(1.0 + np.asarray(freq, dtype=np.float64) / 700.0)


def mel_banks(cfg: FbankConfig) -> np.ndarray:
    """Dense (num_fft_bins, num_bins) triangular mel filter matrix.

    Mirrors Kaldi mel-computations.cc MelBanks: num_fft_bins = padded/2
    (Nyquist excluded), bin centers equally spaced on the 1127*ln(1+f/700)
    scale between low_freq and high_freq.
    """
    padded = cfg.padded_frame_length
    num_fft_bins = padded // 2
    nyquist = 0.5 * cfg.sample_rate
    high_freq = cfg.high_freq if cfg.high_freq > 0 else nyquist + cfg.high_freq
    assert 0 <= cfg.low_freq < high_freq <= nyquist

    fft_bin_width = cfg.sample_rate / padded
    mel_low = mel_scale(cfg.low_freq)
    mel_high = mel_scale(high_freq)
    mel_delta = (mel_high - mel_low) / (cfg.num_bins + 1)

    fft_freqs = fft_bin_width * np.arange(num_fft_bins, dtype=np.float64)
    mel = mel_scale(fft_freqs)[:, None]  # (num_fft_bins, 1)

    bins = np.arange(cfg.num_bins, dtype=np.float64)[None, :]
    left = mel_low + bins * mel_delta
    center = mel_low + (bins + 1) * mel_delta
    right = mel_low + (bins + 2) * mel_delta

    up = (mel - left) / (center - left)
    down = (right - mel) / (right - center)
    weights = np.where((mel > left) & (mel <= center), up, 0.0)
    weights = np.where((mel > center) & (mel < right), down, weights)
    return weights  # (num_fft_bins, num_bins)


@lru_cache(maxsize=8)
def analysis_matrices(cfg: FbankConfig) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(A, B, M): real/imag analysis matrices and the mel matrix.

    A, B: (frame_length, num_fft_bins) fold remove-DC, preemphasis, window
    and the real DFT (zero-padding implicit: only the first frame_length DFT
    rows are kept).  M: (num_fft_bins, num_bins) mel weights.
    Built in float64, returned as float32.
    """
    n = cfg.frame_length
    padded = cfg.padded_frame_length
    num_fft_bins = padded // 2

    t = np.eye(n, dtype=np.float64)
    if cfg.remove_dc_offset:
        t = t - np.full((n, n), 1.0 / n)
    if cfg.preemph_coeff != 0.0:
        # y[i] = x[i] - p * x[i-1]; y[0] = x[0] - p * x[0]
        # (Kaldi feature-window.cc Preemphasize)
        p = np.eye(n, dtype=np.float64)
        p[0, 0] = 1.0 - cfg.preemph_coeff
        p[np.arange(1, n), np.arange(0, n - 1)] = -cfg.preemph_coeff
        t = p @ t
    t = feature_window(cfg)[:, None] * t  # diag(window) @ t

    # Real DFT: X_k = sum_n x_n exp(-2 pi i n k / padded), rows n < frame_length.
    k = np.arange(num_fft_bins, dtype=np.float64)[None, :]
    nn = np.arange(n, dtype=np.float64)[:, None]
    angle = 2.0 * math.pi * nn * k / padded
    a = t.T @ np.cos(angle)
    b = t.T @ (-np.sin(angle))
    m = mel_banks(cfg)
    return (a.astype(np.float32), b.astype(np.float32), m.astype(np.float32))


def frame_indices(max_samples: int, cfg: FbankConfig) -> np.ndarray:
    """(T, frame_length) static gather indices for snip-edges framing."""
    t = num_frames(max_samples, cfg)
    return (
        np.arange(t, dtype=np.int32)[:, None] * cfg.frame_shift
        + np.arange(cfg.frame_length, dtype=np.int32)[None, :]
    )


@partial(jax.jit, static_argnames=("cfg",))
def fbank(
    waves: jax.Array,
    cfg: FbankConfig = FbankConfig(),
    *,
    dither_key: Optional[jax.Array] = None,
) -> jax.Array:
    """Batched log-mel FBANK: (B, S) int16-scale float32 -> (B, T, num_bins).

    T = num_frames(S).  Padded waveforms simply produce garbage frames past
    each utterance's true frame count -- mask downstream with
    ``num_frames_batch``.  Pass ``dither_key`` to enable Kaldi-style dither
    (cfg.dither std in int16 scale); omit for deterministic output.
    """
    if waves.ndim == 1:
        return fbank(waves[None], cfg, dither_key=dither_key)[0]
    assert waves.ndim == 2
    a, b, m = analysis_matrices(cfg)
    idx = frame_indices(waves.shape[1], cfg)
    frames = waves.astype(jnp.float32)[:, idx]  # (B, T, frame_length)
    if dither_key is not None and cfg.dither != 0.0:
        frames = frames + cfg.dither * jax.random.normal(
            dither_key, frames.shape, jnp.float32
        )
    re = jnp.dot(frames, jnp.asarray(a), precision=jax.lax.Precision.HIGHEST)
    im = jnp.dot(frames, jnp.asarray(b), precision=jax.lax.Precision.HIGHEST)
    power = re * re + im * im
    if not cfg.use_power:
        power = jnp.sqrt(power)
    mel = jnp.dot(power, jnp.asarray(m), precision=jax.lax.Precision.HIGHEST)
    if cfg.use_log_fbank:
        mel = jnp.log(jnp.maximum(mel, FLT_EPSILON))
    return mel


def num_frames_batch(num_samples: jax.Array, cfg: FbankConfig) -> jax.Array:
    """Vectorized Kaldi snip-edges frame count (0 for short utterances)."""
    t = 1 + (num_samples - cfg.frame_length) // cfg.frame_shift
    return jnp.maximum(t, 0)


def fbank_i16(
    waves_i16: jax.Array,
    cfg: FbankConfig = FbankConfig(),
    dither_key: Optional[jax.Array] = None,
) -> jax.Array:
    """FBANK over int16-wire waveforms: casts to float32 on device, so the
    host ships half the bytes.  Lossless for PCM16-sourced audio (integral
    int16-scale floats); jit with static_argnames=("cfg",).  Shared by the
    offline prep (data/features.py) and raw-extraction (cli/extract.py)
    pipelines so their wire semantics cannot diverge."""
    w = waves_i16.astype(jnp.float32)
    return fbank(w, cfg, dither_key=dither_key) if dither_key is not None \
        else fbank(w, cfg)


def pcm16(w: np.ndarray) -> np.ndarray:
    """Quantize float samples to the int16 grid (round half to even, clip)
    -- the same 16-bit quantization the reference applies whenever
    wav-reverberate writes PCM16 output.  A no-op for PCM16-sourced floats,
    which are already integral."""
    return np.clip(np.rint(w), -32768, 32767)
