"""On-device feature pipeline: waveform crops -> training features.

The north-star data path: raw audio goes to the device and FBANK + sliding
CMVN run inside the jitted train step, eliminating the reference's offline
feature store (~5.4M compressed-ark utterances for voxceleb2_dev_aug,
prepare_data.sh:161-166) and its apply-cmvn-sliding feeder pipes
(tf_train_tdnn.py:83).

CMVN parity: the reference applies the 300-frame centered sliding window on
the FULL utterance, then crops 200 feature frames (tf_data.py:84-101).
Computing CMVN on a bare 200-frame crop would change edge statistics, so the
host loader crops the waveform with up to 150 frames of *context* on each
side, clipped at the true utterance boundaries (data/raw_dataset.py).  With
the Kaldi window rule start = clip(t-150, 0, n-300), a crop that either
carries full context or abuts a boundary reproduces the full-utterance
window for every target frame, so the sliced features are exactly those the
reference pipeline would feed.

Short utterances (< feat_length frames) mirror tf_data.py:92-95: the valid
frames land at a random shift inside a zero block -- zero *feature* rows,
exactly like the reference's zero-padded feature matrix.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from .cmvn import sliding_cmvn
from .fbank import FbankConfig, fbank, num_frames, num_frames_batch


def crop_samples(feat_length: int, cfg: FbankConfig) -> int:
    """Waveform samples needed for exactly `feat_length` frames."""
    return (feat_length - 1) * cfg.frame_shift + cfg.frame_length


def max_crop_samples(feat_length: int, context: int, cfg: FbankConfig) -> int:
    """Host buffer size: crop + CMVN context on both sides."""
    return crop_samples(feat_length + 2 * context, cfg)


@functools.partial(
    jax.jit, static_argnames=("cfg", "feat_length", "window", "context")
)
def waveform_to_features(
    waves: jax.Array,          # (B, Smax) float32 or int16 (wire format),
                               # int16 scale, zero-padded
    num_samples: jax.Array,    # (B,) int32 valid samples
    target_offset: jax.Array,  # (B,) int32 first target frame within the crop
    pad_shift: jax.Array,      # (B,) int32 zero-pad shift for short utts
    cfg: FbankConfig,
    feat_length: int,
    *,
    window: int = 300,
    context: int = 150,
    dither_key: Optional[jax.Array] = None,
) -> jax.Array:
    """(B, Smax) waveform crops -> (B, feat_length, F) training features.

    For an utterance with n >= feat_length frames the loader sends a crop
    whose frames [target_offset, target_offset + feat_length) are the target
    (context included on both sides as available); pad_shift must be 0.
    For n < feat_length it sends the whole utterance (target_offset 0) and a
    random pad_shift in [0, feat_length - n]; the n valid rows are placed at
    that shift inside zeros.
    """
    del context  # documented contract of the loader; not needed on device
    b = waves.shape[0]
    feats = fbank(waves, cfg, dither_key=dither_key)      # (B, T, F)
    valid = num_frames_batch(num_samples, cfg)             # (B,)
    feats = sliding_cmvn(feats, valid, window=window, center=True)

    # Select feat_length rows starting at target_offset, then re-place at
    # pad_shift with zeros elsewhere (no-op for full-length crops).
    t = feats.shape[1]
    rows = jnp.arange(feat_length, dtype=jnp.int32)[None, :]         # (1, L)
    src = rows - pad_shift[:, None] + target_offset[:, None]          # (B, L)
    in_range = (rows >= pad_shift[:, None]) & (
        src < jnp.minimum(valid, target_offset + feat_length)[:, None]
    )
    gathered = jnp.take_along_axis(
        feats, jnp.clip(src, 0, t - 1)[:, :, None], axis=1
    )
    return jnp.where(in_range[:, :, None], gathered, 0.0)
