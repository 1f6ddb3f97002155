"""Margin-softmax projection heads.

All nine variants of /root/reference/tensorflow/tf_projection.py, as one
parameterized flax module:

  linear            plain matmul logits                      (tf_projection.py:21)
  am_linear         CosFace: cos(theta) - m on target        (:34)
  aam_linear        ArcFace: cos(theta+m) with the reference's extra
                    -0.5*m^2 additive term                   (:56)
  cm_linear         cos(theta+m) - 0.5*m^2                   (:80)
  cm_linear_voxsrc2020   cos(theta+m) - m/2                  (:108)
  hcm_linear        cm + hard-negative +0.1 on cos>target    (:135)
  sc_cm_linear      sub-center (K=2) max-over-centers cm     (:171)
  sc_am_linear      sub-center CosFace                       (:201)
  qm_linear         quadratic margin                         (:226)

Shared behavior (every variant): embeddings l2-normalized along dim with eps
1e-5, kernel l2-normalized along emb dim with eps 1e-5, cos(theta) clipped to
[-1, 1], scale applied last, orthogonal kernel init, kernel l2-regularized at
1e-3 (picked up by the trainer's global kernel sweep).

Sharding: the kernel's class axis (last) is the natural `model`-axis shard at
TPU scale -- cos_theta and the margin arithmetic are purely column-local, and
the softmax reduction is the only cross-shard collective, inserted by GSPMD
from the PartitionSpec (see parallel/sharding.py).  The sub-center max over
K centers is also column-local, so sc_* variants shard identically.

Margin is a traced scalar (scheduled per-step, ref tf_train_tdnn.py:201), so
margin changes never trigger recompilation.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import flax.linen as fnn

PROJECTION_NAMES = (
    "linear", "am_linear", "aam_linear", "cm_linear", "cm_linear_voxsrc2020",
    "hcm_linear", "sc_cm_linear", "sc_am_linear", "qm_linear",
)

_EPS = 1e-5


def _l2_normalize(x: jax.Array, axis: int) -> jax.Array:
    # tf.nn.l2_normalize semantics: x / sqrt(max(sum(x^2), eps^2))... TF uses
    # x * rsqrt(max(sum(x^2), eps)) with eps=1e-5 passed as the *epsilon* on
    # the squared norm.
    sq = jnp.sum(jnp.square(x), axis=axis, keepdims=True)
    return x * jax.lax.rsqrt(jnp.maximum(sq, _EPS))


class MarginProjection(fnn.Module):
    """Unified margin-softmax projection. Returns scaled logits (B, C)."""

    num_classes: int
    kind: str = "sc_cm_linear"
    num_centers: int = 2  # for sc_* variants (ref K=2)
    hard_margin: float = 0.1  # hcm_linear (ref tf_projection.py:136)
    # hcm_linear's margin is a (rotation, additive) *tuple* in the reference,
    # defaulted to (0.2, 0.1); the scheduled scalar maps to margin[0] and the
    # additive term stays fixed at margin[1]=0.1 (ref tf_projection.py:135,153).
    hcm_additive_margin: float = 0.1
    dtype: Optional[Any] = None

    @fnn.compact
    def __call__(
        self,
        embeddings: jax.Array,
        labels: jax.Array,
        scale: jax.Array | float = 32.0,
        margin: jax.Array | float = 0.2,
    ) -> jax.Array:
        assert self.kind in PROJECTION_NAMES, self.kind
        assert embeddings.ndim == 2
        emb_dim = embeddings.shape[1]
        sub_center = self.kind.startswith("sc_")
        kshape = (
            (self.num_centers, emb_dim, self.num_classes)
            if sub_center else (emb_dim, self.num_classes)
        )
        kernel = self.param(
            "kernel", jax.nn.initializers.orthogonal(column_axis=-1),
            kshape, jnp.float32,
        )

        # Margin math in fp32: cos/sin near +-1 are precision-sensitive.
        emb = embeddings.astype(jnp.float32)

        if self.kind == "linear":
            return jnp.dot(emb, kernel)

        emb_n = _l2_normalize(emb, axis=1)
        # Kernel normalized over the embedding axis (axis 0 for 2-D, axis 1
        # for sub-center 3-D kernels -- ref tf_projection.py:45,186).
        kernel_n = _l2_normalize(kernel, axis=0 if not sub_center else 1)

        if sub_center:
            # (K, B, C) -> max over centers (ref tf_projection.py:189,215).
            cos_all = jnp.einsum("bd,kdc->kbc", emb_n, kernel_n)
            cos_theta = jnp.max(cos_all, axis=0)
        else:
            cos_theta = jnp.dot(emb_n, kernel_n)
        cos_theta = jnp.clip(cos_theta, -1.0, 1.0)

        onehot = jax.nn.one_hot(labels, self.num_classes, dtype=jnp.float32)
        margin = jnp.asarray(margin, jnp.float32)

        if self.kind in ("am_linear", "sc_am_linear"):
            logits = cos_theta - margin * onehot
        elif self.kind == "qm_linear":
            delta = (1.0 - margin) / 2.0
            pos = (cos_theta - (1.0 - delta)) * ((1.0 + delta) - cos_theta)
            neg = (cos_theta - delta) * (cos_theta + delta)
            logits = pos * onehot + neg * (1.0 - onehot)
        else:
            # cos(theta + m) family with an additive stabilizer term.
            if self.kind in ("aam_linear", "cm_linear", "sc_cm_linear"):
                margin_1 = 0.5 * margin * margin
            elif self.kind == "cm_linear_voxsrc2020":
                margin_1 = margin / 2.0
            elif self.kind == "hcm_linear":
                # Fixed additive term margin[1]=0.1 (ref tf_projection.py:153),
                # NOT the 0.5*m^2 used by the cm family.
                margin_1 = jnp.float32(self.hcm_additive_margin)
            else:
                raise ValueError(self.kind)
            sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta * cos_theta, 0.0))
            phi = cos_theta * jnp.cos(margin) - sin_theta * jnp.sin(margin) - margin_1

            if self.kind == "hcm_linear":
                target_phi = jnp.sum(phi * onehot, axis=1, keepdims=True)
                hard = (cos_theta > target_phi).astype(jnp.float32)
                neg = cos_theta + self.hard_margin * hard
                logits = phi * onehot + neg * (1.0 - onehot)
            else:
                logits = phi * onehot + cos_theta * (1.0 - onehot)

        return jnp.asarray(scale, jnp.float32) * logits


def cohort_weights(kernel: jax.Array) -> jax.Array:
    """Classifier rows as cohort speaker embeddings (ref
    export_projection_weight.py:28-49): kernel [*, emb, C] or [emb, C] ->
    (K*C, emb), rows l2-normalized."""
    k = kernel if kernel.ndim == 3 else kernel[None]
    rows = jnp.swapaxes(k, -1, -2).reshape(-1, k.shape[-2])
    return rows / jnp.linalg.norm(rows, axis=-1, keepdims=True)
