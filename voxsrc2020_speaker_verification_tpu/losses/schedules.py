"""Step-keyed LR and margin schedules.

Exact piecewise semantics of /root/reference/tensorflow/tf_scheduler.py.
Everything is keyed off the *global optimizer step* -- this preserves the
reference's LMFT resume trick (run_res2net_finetune_local_vox2_dev.sh:51):
restoring a checkpoint whose step is already past boundary[2] automatically
lands the finetune epoch at base_lr/128 with the new margin.

All functions are jit-traceable (jnp.where chains, no Python branches on
traced values).
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp


def warmup_constant_exponential_decay(
    learning_rate: float,
    step: jax.Array,
    boundaries: Sequence[int],
    decay_steps: int,
    decay_rate: float = 0.5,
    staircase: bool = True,
) -> jax.Array:
    """Linear warmup <= b0; constant (b0, b1]; decay_rate^ceil((s-b1)/decay)
    on (b1, b2]; fixed 1/128 tail past b2 (ref tf_scheduler.py:48-77)."""
    assert len(boundaries) == 3
    s = jnp.asarray(step, jnp.float32)
    b0, b1, b2 = [jnp.float32(b) for b in boundaries]
    lr = jnp.float32(learning_rate)
    q = s / b0
    p = (s - b1) / jnp.float32(decay_steps)
    if staircase:
        p = jnp.ceil(p)
    out = jnp.where(s <= b0, lr * q, lr)
    out = jnp.where((s > b1) & (s <= b2), lr * jnp.float32(decay_rate) ** p, out)
    out = jnp.where(s > b2, lr * (1.0 / 128.0), out)
    return out


def warmup_constant_cosine_decay(
    learning_rate: float,
    step: jax.Array,
    boundaries: Sequence[int],
) -> jax.Array:
    """Cosine variant (ref tf_scheduler.py:80-105)."""
    assert len(boundaries) == 3
    s = jnp.asarray(step, jnp.float32)
    b0, b1, b2 = [jnp.float32(b) for b in boundaries]
    lr = jnp.float32(learning_rate)
    q = s / b0
    p = (s - b1) / (b2 - b1)
    out = jnp.where(s <= b0, lr * q, lr)
    out = jnp.where(
        (s > b1) & (s <= b2), lr * 0.5 * (1.0 + jnp.cos(p * math.pi)), out
    )
    out = jnp.where(s > b2, lr * (1.0 / 128.0), out)
    return out


def zero_linear_constant(
    margin: float,
    step: jax.Array,
    boundaries: Sequence[int],
    grow_steps: int,
    staircase: bool = True,
) -> jax.Array:
    """0 until b0; staircase-linear growth to `margin` on (b0, b1]; constant
    after (ref tf_scheduler.py:108-133)."""
    assert len(boundaries) == 2
    s = jnp.asarray(step, jnp.float32)
    b0, b1 = [jnp.float32(b) for b in boundaries]
    m = jnp.float32(margin)
    p = (s - b0) / jnp.float32(grow_steps)
    if staircase:
        p = jnp.ceil(p)
    grow = m * (p * grow_steps) / (b1 - b0)
    out = jnp.where(s <= b0, 0.0, jnp.where(s <= b1, grow, m))
    return out


def total_margin(projection_id: str, margin: jax.Array) -> jax.Array:
    """Reported margin incl. the additive term (ref tf_train_tdnn.py:272-287)."""
    if projection_id in ("linear", "am_linear", "sc_am_linear"):
        return margin + 0.0
    if projection_id in ("aam_linear", "cm_linear", "sc_cm_linear", "hcm_linear"):
        return margin + 0.5 * margin * margin
    if projection_id == "cm_linear_voxsrc2020":
        return margin + 0.5 * margin
    raise ValueError(projection_id)


def base_learning_rate(world_batch: int) -> float:
    """Reference LR scaling: 0.08/128 * world_size * batch * accum
    (tf_train_tdnn.py:198) == 0.08/128 * effective global batch."""
    return 0.08 / 128.0 * world_batch
