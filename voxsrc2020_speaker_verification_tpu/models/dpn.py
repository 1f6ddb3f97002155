"""Dual Path Network (DPN) speaker embedding model.

Behavioral spec from /root/reference/tensorflow/models/dpn_model.py:

* Dual-path block (dpn_model.py:57-87): pre-activation bn-relu-conv layers
  1x1(r) -> 3x3(r, cardinality 32, stride s) -> 1x1(bw + inc); the first bw
  output channels feed a residual path, the rest extend a densely-concatenated
  path.  Projected / downsampled variants compute a bn-relu-conv 1x1 shortcut
  of bw + 2*inc channels split the same way.
* Stem (dpn_model.py:112): 3x3 conv (num_init_features) stride 1 -> BN -> relu.
* 4 stages, k_sec [3,4,12,3], inc [16,32,32,64], bw 64*{1,2,4,8}, r 128*{1,2,4,8};
  stage 1 'projected' (stride 1), stages 2-4 'downsampled' (stride 2)
  (dpn_model.py:111-149).
* Head: concat both paths -> BN -> relu -> pool -> flatten -> BN -> dense ->
  BN (dpn_model.py:151-167).  dpn68 config at dpn_model.py:171.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as fnn

from ..ops import nn as ops


class BnReluConv(fnn.Module):
    """Pre-activation conv (ref dpn_model.py:40-45)."""

    features: int
    kernel_size: int
    strides: int = 1
    cardinality: int = 1
    dtype: Optional[Any] = None

    @fnn.compact
    def __call__(
        self, x: jax.Array, training: bool,
        mask: Optional[jax.Array] = None,
    ) -> jax.Array:
        x = ops.BatchNorm(use_running_average=not training,
                          dtype=self.dtype, name="bn")(x)
        x = jax.nn.relu(x)
        # Only passed for spatial (3x3) convs: re-zero pad frames post-BN so
        # padding garbage cannot enter the receptive field (ops.mask_time).
        x = ops.mask_time(x, mask)
        return ops.Conv2d(
            self.features, self.kernel_size, strides=self.strides, padding="SAME",
            cardinality=self.cardinality, dtype=self.dtype, name="conv2d",
        )(x)


class DualPathBlock(fnn.Module):
    """One dual-path block (ref dpn_model.py:57-87)."""

    num_1_a: int
    num_3_b: int
    num_1_c: int
    inc: int
    projection_type: str  # 'projected' | 'downsampled' | 'normal'
    cardinality: int = 32
    use_se: bool = False
    dtype: Optional[Any] = None

    @fnn.compact
    def __call__(self, inputs, training: bool, mask=None):
        assert self.projection_type in ("projected", "downsampled", "normal")
        strides = 2 if self.projection_type == "downsampled" else 1
        proj = self.projection_type != "normal"

        if isinstance(inputs, (tuple, list)):
            res_in, dense_in = inputs
            x = jnp.concatenate([res_in, dense_in], axis=3)
        else:
            res_in = dense_in = None
            x = inputs

        if proj:
            projected = BnReluConv(
                self.num_1_c + 2 * self.inc, 1, strides,
                dtype=self.dtype, name="proj",
            )(x, training)
            res_in = projected[:, :, :, : self.num_1_c]
            dense_in = projected[:, :, :, self.num_1_c:]

        y = BnReluConv(self.num_1_a, 1, 1, dtype=self.dtype, name="conv_a")(x, training)
        y = BnReluConv(self.num_3_b, 3, strides, cardinality=self.cardinality,
                       dtype=self.dtype, name="conv_b")(y, training, mask)
        if self.use_se:
            y = ops.SqueezeExcitation(ratio=8, dtype=self.dtype, name="se")(y)
        y = BnReluConv(self.num_1_c + self.inc, 1, 1,
                       dtype=self.dtype, name="conv_c")(y, training)

        res_out = y[:, :, :, : self.num_1_c]
        dense_out = y[:, :, :, self.num_1_c:]
        return (res_in + res_out, jnp.concatenate([dense_in, dense_out], axis=3))


@dataclasses.dataclass(frozen=True)
class DpnConfig:
    """Static architecture config (ref dpn_model.py:90-109,171)."""

    name: str
    output_dim: int = 256
    num_init_features: int = 10
    kernel_size: int = 3
    conv_stride: int = 1
    projection_types: Tuple[str, ...] = ("projected", "downsampled", "downsampled", "downsampled")
    bw: int = 64
    k_r: int = 128
    cardinality: int = 32
    k_sec: Tuple[int, ...] = (3, 4, 12, 3)
    inc_sec: Tuple[int, ...] = (16, 32, 32, 64)
    bw_factor: int = 1
    use_se: bool = False
    pool: str = "stats"


class Dpn(fnn.Module):
    """DPN embedding model. Input (B, T, F) features -> (B, output_dim)."""

    config: DpnConfig
    dtype: Optional[Any] = None
    # Rematerialization knobs, same semantics as Res2Net (models/res2net.py):
    # the v5e's 16 GB HBM cannot hold dpn68's f600 LMFT activations at any
    # microbatch without recompute (round-5 sweep, PERF.md).
    remat: bool = False
    remat_policy: Optional[str] = None
    remat_stages: Optional[Tuple[int, ...]] = None
    remat_keep_blocks: Optional[Tuple[Tuple[int, int], ...]] = None

    @fnn.compact
    def __call__(
        self, x: jax.Array, training: bool = False,
        mask: Optional[jax.Array] = None,
    ) -> jax.Array:
        cfg = self.config
        assert x.ndim == 3, "expects (B, T, F) features"
        x = x[:, :, :, None]
        if self.dtype is not None:
            x = x.astype(self.dtype)

        x = ops.Conv2d(cfg.num_init_features, cfg.kernel_size, strides=cfg.conv_stride,
                       padding="SAME", dtype=self.dtype, name="initial_conv")(x)
        x = ops.BatchNorm(use_running_average=not training,
                          dtype=self.dtype, name="initial_bn")(x)
        x = jax.nn.relu(x)
        x = ops.mask_time(x, mask)

        block_cls = DualPathBlock
        if self.remat:
            policy = (getattr(jax.checkpoint_policies, self.remat_policy)
                      if self.remat_policy else None)
            # static_argnums: (2,) = `training` (bool drives BN mode)
            remat_cls = fnn.remat(DualPathBlock, static_argnums=(2,),
                                  policy=policy)
        keep = frozenset(self.remat_keep_blocks or ())

        state = x
        for i in range(4):
            stage_cls = block_cls
            if self.remat and (self.remat_stages is None
                               or i in self.remat_stages):
                stage_cls = remat_cls
            bw = int(cfg.bw * (2 ** i) * cfg.bw_factor)
            inc = cfg.inc_sec[i]
            r = cfg.k_r * bw // (cfg.bw * cfg.bw_factor)
            for j in range(cfg.k_sec[i]):
                ptype = cfg.projection_types[i] if j == 0 else "normal"
                state = (block_cls if (i, j) in keep else stage_cls)(
                    num_1_a=r, num_3_b=r, num_1_c=bw, inc=inc,
                    projection_type=ptype, cardinality=cfg.cardinality,
                    use_se=cfg.use_se, dtype=self.dtype,
                    name=f"stage{i + 1}_block{j + 1}",
                )(state, training, mask)
                if mask is not None:
                    strides = 2 if ptype == "downsampled" else 1
                    mask = ops.downsample_mask(mask, strides, state[0].shape[1])
                    state = tuple(ops.mask_time(s, mask) for s in state)

        x = jnp.concatenate(list(state), axis=3)
        x = ops.BatchNorm(use_running_average=not training,
                          dtype=self.dtype, name="final_bn")(x)
        x = jax.nn.relu(x)

        return ops.EmbeddingHead(
            output_dim=cfg.output_dim, pool=cfg.pool, dtype=self.dtype, name="head"
        )(x, training, mask)


DPN_CONFIGS = {
    "dpn68": DpnConfig(name="dpn68"),
}


def dpn(name: str, dtype=None, remat: bool = False, remat_policy=None,
        remat_stages=None, remat_keep_blocks=None) -> Dpn:
    return Dpn(config=DPN_CONFIGS[name], dtype=dtype, remat=remat,
               remat_policy=remat_policy,
               remat_stages=(tuple(remat_stages)
                             if remat_stages is not None else None),
               remat_keep_blocks=(tuple(map(tuple, remat_keep_blocks))
                                  if remat_keep_blocks is not None else None))
