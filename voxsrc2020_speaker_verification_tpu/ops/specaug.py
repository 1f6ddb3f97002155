"""SpecAugment, on-device and batched.

Reproduces the reference's exact (quirky) sampling semantics
(/root/reference/tensorflow/spec_augment.py:27-62, applied tf_data.py:104-109):
one frequency mask and one time mask per utterance, zero-filled, with

    f     ~ uniform{0 .. param-1}   (param: freq 5+1, time 8+1)
    start ~ uniform{0 .. dim-f-1}
    width ~ uniform{0 .. f-1}       (no mask at all when f == 0)

so the *effective* masked width is at most param-2 (4 freq bins / 7 frames).

TPU-first: instead of the reference's per-utterance host-side numpy loop, the
masks are computed as broadcasted-iota comparisons inside jit, vmapped over
the batch -- zero host work, fuses into the input pipeline.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

FREQ_PARAM = 6  # ref tf_data.py:107 freq mask param 5+1
TIME_PARAM = 9  # ref tf_data.py:108 time mask param 8+1


def _mask_1d(key: jax.Array, dim: int, param: int) -> jax.Array:
    """(dim,) 0/1 keep-mask with the reference's three-step sampling."""
    kf, ks, kw = jax.random.split(key, 3)
    f = jax.random.randint(kf, (), 0, param)
    start = jax.random.randint(ks, (), 0, jnp.maximum(dim - f, 1))
    width = jnp.where(f > 0, jax.random.randint(kw, (), 0, jnp.maximum(f, 1)), 0)
    idx = jnp.arange(dim)
    return jnp.where((idx >= start) & (idx < start + width), 0.0, 1.0)


@partial(jax.jit, static_argnames=("freq_param", "time_param"))
def spec_augment(
    key: jax.Array,
    feats: jax.Array,
    freq_param: int = FREQ_PARAM,
    time_param: int = TIME_PARAM,
) -> jax.Array:
    """Apply one freq + one time zero-mask per utterance. feats: (B, T, F)."""
    b, t, f = feats.shape

    def one(k, x):
        kt, kf = jax.random.split(k)
        tmask = _mask_1d(kt, t, time_param)
        fmask = _mask_1d(kf, f, freq_param)
        return x * tmask[:, None] * fmask[None, :]

    return jax.vmap(one)(jax.random.split(key, b), feats)
