"""ECAPA-TDNN speaker embedding model (framework extension).

NOT part of the reference model zoo -- added because it is the de-facto
modern speaker-verification architecture (Desplanques et al., Interspeech
2020, arXiv:2005.07143) and composes entirely from primitives this framework
already proves against the reference (Res2Net-style split convs, SE blocks,
attentive stats pooling, dilated 1-D TDNN convs).

Architecture (paper §2, Table 1):

* stem: Conv1d(k=5) -> relu -> BN
* 3 SE-Res2Blocks, dilations 2/3/4: 1x1 conv-relu-BN, dilated split-conv
  stage (scale s=8, hierarchical adds), 1x1 conv-relu-BN, SE; residual add
* Multi-layer Feature Aggregation: concat the 3 block outputs -> 1x1 conv
  (1536) -> relu
* channel- and context-dependent attentive stats pooling (attention sees
  [x; mu; sigma], per-channel softmax over time) -> BN
* dense -> BN -> 192-d embedding

Deviations from the paper kept consistent with this framework's conventions
(affine-free BN, bias-free convs, fp32 pooling) so ECAPA trains through the
same jitted step, margin losses, schedules and sharding as the reference
models.  1-D convs are expressed as (k, 1) 2-D convs over the (B, T, 1, C)
layout -- identical lowering to the TDNN family (models/tdnn.py), so
everything tiles onto the MXU the same way.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as fnn

from ..ops import nn as ops


class Conv1dReluBn(fnn.Module):
    """k-tap time conv -> relu -> BN on the (B, T, 1, C) layout."""

    features: int
    kernel_size: int = 1
    dilation: int = 1
    dtype: Optional[Any] = None

    @fnn.compact
    def __call__(self, x: jax.Array, training: bool) -> jax.Array:
        x = ops.Conv2d(
            self.features, (self.kernel_size, 1), padding="SAME",
            dilation=(self.dilation, 1), dtype=self.dtype, name="conv2d",
        )(x)
        x = jax.nn.relu(x)
        return ops.BatchNorm(use_running_average=not training,
                             dtype=self.dtype, name="bn")(x)


class EcapaSplitConv(fnn.Module):
    """Res2Net-style hierarchical split stage with time dilation (paper §2.2).

    Unlike the reference's shared [k,k,w,w*(s-1)] kernel (res2net_model.py:46),
    ECAPA follows the original Res2Net formulation: independent per-group
    convs, group 0 passes through, groups 1..s-1 convolve g_i + y_{i-1}."""

    split: int
    width: int
    kernel_size: int = 3
    dilation: int = 1
    dtype: Optional[Any] = None

    @fnn.compact
    def __call__(
        self, x: jax.Array, training: bool,
        mask: Optional[jax.Array] = None,
    ) -> jax.Array:
        s, w = self.split, self.width
        assert x.shape[-1] == s * w, (x.shape, s, w)
        groups = jnp.split(x, s, axis=3)
        outputs = [groups[0]]
        for i in range(1, s):
            inp = groups[i]
            if i > 1:
                inp = inp + ops.mask_time(outputs[-1], mask)
            y = ops.Conv2d(
                w, (self.kernel_size, 1), padding="SAME",
                dilation=(self.dilation, 1), dtype=self.dtype,
                name=f"conv{i}",
            )(inp)
            y = jax.nn.relu(y)
            y = ops.BatchNorm(use_running_average=not training,
                              dtype=self.dtype, name=f"bn{i}")(y)
            outputs.append(y)
        return jnp.concatenate(outputs, axis=3)


class SERes2Block(fnn.Module):
    """1x1 conv-relu-BN -> dilated split stage -> 1x1 conv-relu-BN -> SE,
    with a residual connection (paper Fig. 2)."""

    channels: int
    split: int
    dilation: int
    se_ratio: int = 8
    dtype: Optional[Any] = None

    @fnn.compact
    def __call__(
        self, x: jax.Array, training: bool,
        mask: Optional[jax.Array] = None,
    ) -> jax.Array:
        shortcut = x
        x = Conv1dReluBn(self.channels, 1, dtype=self.dtype, name="conv1")(x, training)
        x = ops.mask_time(x, mask)
        x = EcapaSplitConv(
            split=self.split, width=self.channels // self.split,
            dilation=self.dilation, dtype=self.dtype, name="split_conv",
        )(x, training, mask)
        x = Conv1dReluBn(self.channels, 1, dtype=self.dtype, name="conv3")(x, training)
        # Re-zero pad rows before the global SE squeeze (BN shifts them off 0).
        x = ops.mask_time(x, mask)
        x = ops.SqueezeExcitation(ratio=self.se_ratio, dtype=self.dtype,
                                  name="se")(x, mask)
        return x + shortcut


@dataclasses.dataclass(frozen=True)
class EcapaConfig:
    name: str
    channels: int = 512        # 512 (small) or 1024 (large) per the paper
    split: int = 8
    dilations: Tuple[int, ...] = (2, 3, 4)
    mfa_dim: int = 1536
    att_dim: int = 128
    output_dim: int = 192
    se_ratio: int = 8


class Ecapa(fnn.Module):
    """ECAPA-TDNN. Input (B, T, F) features -> (B, output_dim)."""

    config: EcapaConfig
    dtype: Optional[Any] = None

    @fnn.compact
    def __call__(
        self, x: jax.Array, training: bool = False,
        mask: Optional[jax.Array] = None,
    ) -> jax.Array:
        cfg = self.config
        assert x.ndim == 3, "expects (B, T, F) features"
        x = x[:, :, None, :]  # (B, T, 1, F): 1-D conv layout (as models/tdnn.py)
        if self.dtype is not None:
            x = x.astype(self.dtype)

        x = Conv1dReluBn(cfg.channels, 5, dtype=self.dtype, name="stem")(x, training)
        x = ops.mask_time(x, mask)

        feats = []
        for i, d in enumerate(cfg.dilations):
            x = SERes2Block(
                channels=cfg.channels, split=cfg.split, dilation=d,
                se_ratio=cfg.se_ratio, dtype=self.dtype, name=f"block{i + 1}",
            )(x, training, mask)
            x = ops.mask_time(x, mask)
            feats.append(x)

        # Multi-layer Feature Aggregation (paper §2.4).
        x = jnp.concatenate(feats, axis=3)
        x = ops.Conv2d(cfg.mfa_dim, 1, dtype=self.dtype, name="mfa")(x)
        x = jax.nn.relu(x)
        x = ops.mask_time(x, mask)

        x = ops.AttStatsPool(
            att_dim=cfg.att_dim, dtype=self.dtype, name="att_stats_pool"
        )(x, mask)
        x = x.reshape((x.shape[0], -1))
        x = ops.BatchNorm(use_running_average=not training,
                          dtype=self.dtype, name="pre_bn")(x)
        x = ops.Dense(cfg.output_dim, dtype=self.dtype, name="embedding")(x)
        return ops.BatchNorm(use_running_average=not training,
                             dtype=self.dtype, name="post_bn")(x)


ECAPA_CONFIGS = {
    "ecapa_tdnn_512": EcapaConfig(name="ecapa_tdnn_512", channels=512),
    "ecapa_tdnn_1024": EcapaConfig(name="ecapa_tdnn_1024", channels=1024),
}


def ecapa(name: str, dtype=None) -> Ecapa:
    return Ecapa(config=ECAPA_CONFIGS[name], dtype=dtype)
