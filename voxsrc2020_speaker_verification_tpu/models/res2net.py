"""Res2Net speaker embedding models.

Behavioral spec from /root/reference/tensorflow/models/res2net_model.py:

* Bottleneck-v1 block (res2net_model.py:81-103): 1x1 conv -> BN -> relu,
  hierarchical split-s 3x3 stage, 1x1 conv -> BN, + shortcut, relu.
  filters_out = filters * 4.  Projection shortcut = 1x1 strided conv + BN.
* Split stage (res2net_model.py:26-78): the input is split into `s` groups of
  `width` channels; one shared kernel [k, k, width, width*(s-1)] is sliced per
  group; group 0 is convolved directly, groups 1..s-2 add the previous group's
  output first (only at stride 1), and the last group passes through (stride 1)
  or is 3x3 average-pooled (stride 2).  Each convolved group gets BN + relu.
* Stem: 3x3 conv stride 1, BN, relu; no max-pool (res2net_model.py:192-210).
* Stages: block_sizes x strides [1,2,2,2]; head: (att_)stats pool, flatten,
  BN, dense(output_dim), BN (res2net_model.py:229-242).

TPU notes: the split stage is an intrinsically sequential chain of small
convs; we keep the single shared [k,k,w,w*(s-1)] parameter (checkpoint parity)
and unroll the s-1 convs -- XLA fuses the BN+relu chains, and all convs hit
the MXU.  Masked pooling supports padded batched extraction; the (B, T) mask
is downsampled by taking every `stride`-th frame at each strided stage.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as fnn

from ..ops import nn as ops


class Res2NetSplitConv(fnn.Module):
    """Hierarchical split-s 3x3 conv stage (ref res2net_model.py:26-78)."""

    split: int
    width: int
    strides: int = 1
    kernel_size: int = 3
    dtype: Optional[Any] = None

    @fnn.compact
    def __call__(
        self, x: jax.Array, training: bool,
        mask: Optional[jax.Array] = None,
    ) -> jax.Array:
        s, w, k = self.split, self.width, self.kernel_size
        assert x.shape[-1] == s * w, (x.shape, s, w)
        if self.strides > 1:
            x = ops.fixed_padding(x, k)
        padding = "SAME" if self.strides == 1 else "VALID"

        kernel = self.param(
            "kernel", ops.conv_kernel_init, (k, k, w, w * (s - 1)), jnp.float32
        )
        kernel = kernel.astype(x.dtype)

        def bn_relu(y, idx):
            y = ops.BatchNorm(use_running_average=not training,
                              dtype=self.dtype, name=f"bn{idx}")(y)
            return jax.nn.relu(y)

        if self.strides > 1:
            # At stride > 1 the reference skips the hierarchical adds
            # (res2net_model.py:62-65), so the s-1 convs are independent:
            # batch them as ONE grouped conv (feature_group_count = s-1) --
            # bit-identical math, one MXU dispatch instead of s-1.
            # ops.grouped_conv carries the GSPMD-safe kernel gradient
            # (XLA mis-reduces feature-grouped kernel grads over unused
            # mesh axes -- see its docstring).
            y = ops.grouped_conv(
                x[..., : w * (s - 1)], kernel,
                (self.strides, self.strides), padding, (1, 1), s - 1,
            )
            outputs = [bn_relu(y[..., i * w: (i + 1) * w], i) for i in range(s - 1)]
            outputs.append(ops.avg_pool_3x3(x[..., w * (s - 1):], self.strides))
            return jnp.concatenate(outputs, axis=3)

        groups = jnp.split(x, s, axis=3)
        kernels = jnp.split(kernel, s - 1, axis=3)

        dn = jax.lax.conv_dimension_numbers(
            groups[0].shape, kernels[0].shape, ("NHWC", "HWIO", "NHWC")
        )

        def conv(inp, ker):
            return jax.lax.conv_general_dilated(
                inp, ker, window_strides=(self.strides, self.strides),
                padding=padding, dimension_numbers=dn,
            )

        outputs = []
        for idx in range(s - 1):
            inp = groups[idx]
            if idx > 0:
                # mask the hierarchical add: the previous group's BN+relu is
                # nonzero at padded positions once BN stats are trained, and
                # this sum feeds a 3x3 conv (see ops.mask_time).
                inp = inp + ops.mask_time(outputs[idx - 1], mask)
            y = conv(inp, kernels[idx])
            outputs.append(bn_relu(y, idx))

        outputs.append(groups[s - 1])
        return jnp.concatenate(outputs, axis=3)


class BottleneckBlockV1(fnn.Module):
    """Res2Net bottleneck v1 (ref res2net_model.py:81-103)."""

    filters: int
    strides: int
    use_projection: bool
    split: int
    width: int
    cardinality: int = 1
    dtype: Optional[Any] = None

    @fnn.compact
    def __call__(
        self, x: jax.Array, training: bool,
        mask: Optional[jax.Array] = None,
    ) -> jax.Array:
        filters_out = self.filters * 4 if self.cardinality == 1 else self.filters * 2
        shortcut = x
        if self.use_projection:
            shortcut = ops.ConvFixedPadding(
                filters_out, 1, self.strides, dtype=self.dtype, name="proj_conv"
            )(x)
            shortcut = ops.BatchNorm(use_running_average=not training,
                                     dtype=self.dtype, name="proj_bn")(shortcut)

        x = ops.ConvFixedPadding(self.split * self.width, 1, 1,
                                 dtype=self.dtype, name="conv1")(x)
        x = ops.BatchNorm(use_running_average=not training,
                          dtype=self.dtype, name="bn1")(x)
        x = jax.nn.relu(x)
        # Re-zero pad frames before the 3x3 stage (BN shifts zeros off zero).
        x = ops.mask_time(x, mask)

        x = Res2NetSplitConv(
            split=self.split, width=self.width, strides=self.strides,
            dtype=self.dtype, name="split_conv",
        )(x, training, mask)

        x = ops.ConvFixedPadding(filters_out, 1, 1, dtype=self.dtype, name="conv3")(x)
        x = ops.BatchNorm(use_running_average=not training,
                          dtype=self.dtype, name="bn3")(x)
        return jax.nn.relu(x + shortcut)


@dataclasses.dataclass(frozen=True)
class Res2NetConfig:
    """Static architecture config (ref res2net_model.py:246-280 instances)."""

    name: str
    num_filters: Tuple[int, ...] = (32, 64, 128, 256)
    block_sizes: Tuple[int, ...] = (3, 4, 6, 3)
    block_strides: Tuple[int, ...] = (1, 2, 2, 2)
    width: Tuple[int, ...] = (24, 48, 96, 192)
    split: int = 4
    output_dim: int = 256
    kernel_size: int = 3
    conv_stride: int = 1
    pool: str = "stats"  # "stats" | "att_stats"


class Res2Net(fnn.Module):
    """Res2Net embedding model. Input (B, T, F) features -> (B, output_dim)."""

    config: Res2NetConfig
    dtype: Optional[Any] = None
    remat: bool = False  # per-block rematerialization: trades one extra
                         # forward in backward for O(depth) activation memory
    remat_policy: Optional[str] = None  # jax.checkpoint_policies name, e.g.
                         # "dots_saveable": save MXU outputs inside remat'd
                         # blocks, recompute only elementwise chains
    remat_stages: Optional[Tuple[int, ...]] = None  # with remat=True, apply
                         # it only to these 0-based stages. Early stages hold
                         # the largest (un-downsampled) activations, so
                         # remat_stages=(0, 1) buys most of the memory back
                         # for a fraction of the recompute tax
    remat_keep_blocks: Optional[Tuple[Tuple[int, int], ...]] = None
                         # block-granular override: (stage, block) pairs
                         # (0-based) kept RESIDENT inside remat'd stages --
                         # when stage granularity leaves HBM headroom, each
                         # kept block skips its recompute (measured win on
                         # the w8 f600 LMFT leg, PERF.md round 4)

    @fnn.compact
    def __call__(
        self, x: jax.Array, training: bool = False,
        mask: Optional[jax.Array] = None,
    ) -> jax.Array:
        cfg = self.config
        assert x.ndim == 3, "expects (B, T, F) features"
        x = x[:, :, :, None]  # (B, T, F, 1): 2-D conv layout (ref expansion_dim 3)
        if self.dtype is not None:
            x = x.astype(self.dtype)

        x = ops.ConvFixedPadding(
            cfg.num_filters[0], cfg.kernel_size, cfg.conv_stride,
            dtype=self.dtype, name="initial_conv",
        )(x)
        x = ops.BatchNorm(use_running_average=not training,
                          dtype=self.dtype, name="initial_bn")(x)
        x = jax.nn.relu(x)
        if mask is not None:
            mask = ops.downsample_mask(mask, cfg.conv_stride, x.shape[1])
            x = ops.mask_time(x, mask)

        block_cls = BottleneckBlockV1
        if self.remat:
            policy = (getattr(jax.checkpoint_policies, self.remat_policy)
                      if self.remat_policy else None)
            # static_argnums: (2,) = `training` (bool drives BN mode)
            remat_cls = fnn.remat(BottleneckBlockV1, static_argnums=(2,),
                                  policy=policy)
        keep = frozenset(self.remat_keep_blocks or ())
        for i, num_blocks in enumerate(cfg.block_sizes):
            stage_cls = block_cls
            if self.remat and (self.remat_stages is None
                               or i in self.remat_stages):
                stage_cls = remat_cls
            for j in range(num_blocks):
                block_stage_cls = (block_cls if (i, j) in keep
                                   else stage_cls)
                strides = cfg.block_strides[i] if j == 0 else 1
                x = block_stage_cls(
                    filters=cfg.num_filters[i], strides=strides,
                    use_projection=(j == 0), split=cfg.split, width=cfg.width[i],
                    dtype=self.dtype, name=f"layer{i + 1}_block{j + 1}",
                )(x, training, mask)
                if mask is not None:
                    mask = ops.downsample_mask(mask, strides, x.shape[1])
                    x = ops.mask_time(x, mask)

        return ops.EmbeddingHead(
            output_dim=cfg.output_dim, pool=cfg.pool, dtype=self.dtype, name="head"
        )(x, training, mask)


# Recipe configs (ref res2net_model.py:246-280).
RES2NET_CONFIGS = {
    "res2net50_w24_s4_c64": Res2NetConfig(
        name="res2net50_w24_s4_c64", num_filters=(64, 128, 256, 512)),
    "res2net50_w24_s4_c32": Res2NetConfig(
        name="res2net50_w24_s4_c32", num_filters=(32, 64, 128, 256)),
    "res2net50_w8_s6_c16": Res2NetConfig(
        name="res2net50_w8_s6_c16", num_filters=(16, 32, 64, 128),
        width=(8, 16, 32, 64), split=6, output_dim=192),
    "res2net101_w24_s4_c32_att": Res2NetConfig(
        name="res2net101_w24_s4_c32_att", num_filters=(32, 64, 128, 256),
        block_sizes=(3, 4, 23, 3), pool="att_stats"),
    "res2net152_w24_s4_c32_att": Res2NetConfig(
        name="res2net152_w24_s4_c32_att", num_filters=(32, 64, 128, 256),
        block_sizes=(3, 8, 36, 3), pool="att_stats"),
    "res2net200_w24_s4_c32_att": Res2NetConfig(
        name="res2net200_w24_s4_c32_att", num_filters=(32, 64, 128, 256),
        block_sizes=(3, 24, 36, 3), pool="att_stats"),
}


def register_res2net_variant(name: str, **kwargs) -> str:
    """Register `name` -> Res2NetConfig(name=name, **kwargs) for
    get_model()/tf_import.  The reference Model class is parameterized the
    same way (ref res2net_model.py:139-167); used e.g. for the CPU-sized
    cross-stack system-equivalence run where both stacks train a thin
    instance of the identical architecture."""
    RES2NET_CONFIGS[name] = Res2NetConfig(name=name, **kwargs)
    return name


def res2net(name: str, dtype=None, remat: bool = False,
            remat_policy=None, remat_stages=None,
            remat_keep_blocks=None) -> Res2Net:
    return Res2Net(config=RES2NET_CONFIGS[name], dtype=dtype, remat=remat,
                   remat_policy=remat_policy,
                   remat_stages=(tuple(remat_stages)
                                 if remat_stages is not None else None),
                   remat_keep_blocks=(tuple(map(tuple, remat_keep_blocks))
                                      if remat_keep_blocks is not None
                                      else None))
