"""Sliding-window cepstral mean normalization (CMN), Kaldi-compatible.

Matches ``apply-cmvn-sliding --norm-vars=false --center=true --cmn-window=300``
-- the exact feature read-spec the reference trainer and extractor use
(/root/reference/tensorflow/tf_train_tdnn.py:83, tf_extract.py:63).

Kaldi semantics (matrix/cmvn: SlidingWindowCmn with center=true): for frame t
of an utterance with n frames, the window is the cmn_window frames centered on
t, shifted to stay inside [0, n):

    start = clip(t - w//2, 0, max(0, n - w));  end = min(start + w, n)

and only the window *mean* is subtracted (norm_vars=false).

TPU-first: one exclusive cumulative sum over time plus two gathers -- O(T)
instead of the reference's O(T*w) C++ loop -- fully batched over padded
utterances with per-utterance valid-frame counts, jit/vmap friendly.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("window", "center", "norm_vars", "min_window"))
def sliding_cmvn(
    feats: jax.Array,
    num_valid: Optional[jax.Array] = None,
    *,
    window: int = 300,
    center: bool = True,
    norm_vars: bool = False,
    min_window: int = 100,
) -> jax.Array:
    """Apply sliding CMN over the time axis.

    feats:     (B, T, F) or (T, F) float features (padded beyond num_valid).
    num_valid: (B,) int32 true frame counts; None means all T frames valid.
    Returns normalized features; padded frames are passed through with the
    last window's statistics (mask downstream).
    """
    if feats.ndim == 2:
        out = sliding_cmvn(
            feats[None],
            None if num_valid is None else jnp.atleast_1d(num_valid),
            window=window, center=center, norm_vars=norm_vars, min_window=min_window,
        )
        return out[0]
    assert feats.ndim == 3
    b, t, f = feats.shape
    n = jnp.full((b,), t, jnp.int32) if num_valid is None else num_valid.astype(jnp.int32)

    x = feats.astype(jnp.float32)
    # Zero out pad frames so cumsum windows that ignore them stay exact.
    valid = (jnp.arange(t)[None, :] < n[:, None]).astype(jnp.float32)
    xz = x * valid[:, :, None]

    csum = jnp.cumsum(xz, axis=1)
    csum = jnp.concatenate([jnp.zeros((b, 1, f), jnp.float32), csum], axis=1)

    ts = jnp.arange(t, dtype=jnp.int32)[None, :]  # (1, T)
    if center:
        start = jnp.clip(ts - window // 2, 0, jnp.maximum(0, n[:, None] - window))
        end = jnp.minimum(start + window, n[:, None])
    else:
        # Kaldi non-centered: trailing window, grown to >= min_window at the start.
        start = jnp.maximum(ts - window + 1, 0)
        end = jnp.minimum(jnp.maximum(ts + 1, jnp.minimum(min_window, n[:, None])), n[:, None])
        start = jnp.minimum(start, jnp.maximum(end - window, 0))
    count = jnp.maximum(end - start, 1).astype(jnp.float32)[:, :, None]

    def window_sum(c, idx):
        return jnp.take_along_axis(c, idx[:, :, None].astype(jnp.int32), axis=1)

    mean = (window_sum(csum, end) - window_sum(csum, start)) / count
    out = x - mean
    if norm_vars:
        csq = jnp.cumsum(xz * xz, axis=1)
        csq = jnp.concatenate([jnp.zeros((b, 1, f), jnp.float32), csq], axis=1)
        var = (window_sum(csq, end) - window_sum(csq, start)) / count - mean * mean
        # Kaldi floors variance at 1e-10 before rsqrt.
        out = out * jax.lax.rsqrt(jnp.maximum(var, 1e-10))
    return out.astype(feats.dtype)


def global_cmvn(feats: jax.Array, mean: jax.Array, std: jax.Array) -> jax.Array:
    """Global mean/std normalization (ref tf_data.py:80-81 cmvn_pkl path)."""
    return (feats - mean) / std
