"""SpeakerNet: encoder + margin projection as one flax module.

The reference builds these separately in the trainer graph
(tf_train_tdnn.py:210-214); fusing them into one module gives a single
variables pytree whose ``params/projection/kernel`` leaf is the model-axis
sharded classifier (see parallel/sharding.py).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import flax.linen as fnn

from ..models import get_model
from ..losses import MarginProjection
from ..ops import nn as ops


class SpeakerNet(fnn.Module):
    model_name: str = "res2net50_w24_s4_c32"
    projection_id: str = "sc_cm_linear"
    num_classes: int = 5994
    num_centers: int = 2
    dtype: Optional[Any] = None
    remat: bool = False
    remat_policy: Optional[str] = None
    remat_stages: Optional[tuple] = None
    remat_keep_blocks: Optional[tuple] = None
    bn_groups: int = 1  # >1: per-replica BN statistics over G batch groups
                        # (the reference's Horovod BN, models.py:62-73)

    def setup(self):
        self.encoder = get_model(self.model_name, dtype=self.dtype,
                                 remat=self.remat,
                                 remat_policy=self.remat_policy,
                                 remat_stages=self.remat_stages,
                                 remat_keep_blocks=self.remat_keep_blocks)
        self.projection = MarginProjection(
            num_classes=self.num_classes, kind=self.projection_id,
            num_centers=self.num_centers, dtype=self.dtype, name="projection",
        )

    def __call__(self, feats, labels, scale, margin, training: bool = True):
        with ops.bn_groups(self.bn_groups):
            emb = self.encoder(feats, training)
        logits = self.projection(emb, labels, scale, margin)
        return emb, logits

    def embed(self, feats, mask=None):
        """Inference-mode embeddings (the exported `outputs` tensor), fp32."""
        import jax.numpy as jnp
        return self.encoder(feats, False, mask).astype(jnp.float32)
