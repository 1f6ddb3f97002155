"""TDNN (x-vector style) speaker embedding model.

Behavioral spec from /root/reference/tensorflow/models/tdnn_model.py:
5 conv blocks on the time axis -- filters [512,512,512,512,1536], kernels
[(5,1),(3,1),(3,1),(1,1),(1,1)], time dilations [1,2,3,1,1], each block
conv -> act -> norm (block variants reorder / swap act & norm, tdnn_model.py:24-109)
-- then stats pooling, flatten, BN, dense(256), BN (tdnn_model.py:128-155).

The reference feeds NHWC with W=1 (inputs (B,T,1,F), tf_train_tdnn.py:189-192);
time-dilated (k,1) convs over that layout are exactly 1-D dilated convs over
(B, T, F_in) -> (B, T, F_out).  We keep the 4-D layout so the conv weights
[k, 1, in, out] port one-to-one from reference checkpoints.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as fnn

from ..ops import nn as ops


class TdnnBlock(fnn.Module):
    """One conv block; `order` controls act/norm arrangement, matching the
    reference block variants (tdnn_model.py:24-109)."""

    filters: int
    kernel_size: Tuple[int, int]
    dilation: Tuple[int, int]
    cardinality: int = 1
    order: str = "conv_relu_bn"  # conv_{relu|gelu|mish}_{bn|ln} | conv_bn_relu
                                  # | conv_se_relu_bn | conv_relu_se_bn | conv_bn_se_relu
    dtype: Optional[Any] = None

    @fnn.compact
    def __call__(self, x: jax.Array, training: bool) -> jax.Array:
        x = ops.Conv2d(
            self.filters, self.kernel_size, padding="SAME",
            dilation=self.dilation, cardinality=self.cardinality,
            dtype=self.dtype, name="conv2d",
        )(x)
        parts = self.order.split("_")[1:]
        for i, p in enumerate(parts):
            if p == "relu":
                x = jax.nn.relu(x)
            elif p == "gelu":
                x = ops.gelu(x)
            elif p == "mish":
                x = ops.mish(x)
            elif p == "bn":
                x = ops.BatchNorm(use_running_average=not training,
                                  dtype=self.dtype, name="bn")(x)
            elif p == "ln":
                x = ops.layer_norm(x)
            elif p == "se":
                ratio = 8 if parts[i - 1] == "relu" else 16
                x = ops.SqueezeExcitation(ratio=ratio, dtype=self.dtype, name="se")(x)
            else:
                raise ValueError(f"unknown block part {p}")
        return x


class Tdnn(fnn.Module):
    """TDNN embedding model. Input (B, T, F) features -> (B, output_dim)."""

    output_dim: int = 256
    block_filters: Sequence[int] = (512, 512, 512, 512, 1536)
    block_kernel_sizes: Sequence[Tuple[int, int]] = ((5, 1), (3, 1), (3, 1), (1, 1), (1, 1))
    block_dilations: Sequence[Tuple[int, int]] = ((1, 1), (2, 1), (3, 1), (1, 1), (1, 1))
    block_cardinalities: Optional[Sequence[int]] = None
    block_order: str = "conv_relu_bn"
    pool: str = "stats"
    dtype: Optional[Any] = None

    @fnn.compact
    def __call__(
        self, x: jax.Array, training: bool = False,
        mask: Optional[jax.Array] = None,
    ) -> jax.Array:
        assert x.ndim == 3, "expects (B, T, F) features"
        x = x[:, :, None, :]  # (B, T, 1, F): NHWC with W=1 (ref layout)
        if self.dtype is not None:
            x = x.astype(self.dtype)
        for i, (f, k, d) in enumerate(
            zip(self.block_filters, self.block_kernel_sizes, self.block_dilations)
        ):
            card = 1 if self.block_cardinalities is None else self.block_cardinalities[i]
            x = TdnnBlock(
                filters=f, kernel_size=tuple(k), dilation=tuple(d), cardinality=card,
                order=self.block_order, dtype=self.dtype, name=f"block{i + 1}",
            )(x, training)
            x = ops.mask_time(x, mask)
        return ops.EmbeddingHead(
            output_dim=self.output_dim, pool=self.pool, dtype=self.dtype, name="head"
        )(x, training, mask)


# Non-recipe TDNN geometries (same block structure, different widths) --
# the reference Model class is parameterized the same way (tdnn_model.py:
# 112-124); used e.g. for the cross-stack system-equivalence run where both
# stacks train a CPU-sized instance of the identical architecture.
TDNN_VARIANTS = {}


def register_tdnn_variant(name: str, **kwargs) -> str:
    """Register `name` -> Tdnn(**kwargs) for get_model()/tf_import."""
    TDNN_VARIANTS[name] = dict(kwargs)
    return name


def tdnn(name: str = "tdnn", dtype=None) -> Tdnn:
    """The recipe model `tdnn` (ref tdnn_model.py:158-161) or a registered
    variant."""
    if name == "tdnn":
        return Tdnn(dtype=dtype)
    return Tdnn(dtype=dtype, **TDNN_VARIANTS[name])
