"""Training runtime: one jitted, sharded train step.

Replaces the reference's feed_dict loop + Horovod graph machinery
(/root/reference/tensorflow/tf_train_tdnn.py:194-317) with a single pjit-ted
function per optimizer step:

* gradient accumulation -- the reference's fp32 accum vars + every-Nth-step
  update (tf_train_tdnn.py:229-258) becomes a `lax.scan` over the
  `num_accumulation_steps` leading axis of the batch: one compiled step per
  *optimizer* step, grads accumulated in fp32 on device.
* allreduce -- the reference's post-accumulation fp16 Horovod allreduce
  (:250-252) is GSPMD's psum over the `data` mesh axis, inserted automatically
  because params are replicated and the batch is sharded.
* l2 regularization -- the reference attaches l2(1e-3) to every kernel via
  graph collections (models.py:26-55); here the reg gradient is added in
  closed form (`l2_scale * param`), and the reported reg loss is
  l2_scale * 0.5 * sum(w^2) over kernel params, identical math.
* optimizer -- SGD momentum 0.9 (trace form, same as tf.train.MomentumOptimizer),
  global-norm clip 1.0 *after* accumulation+allreduce, LR/margin schedules
  keyed off the global step (preserving the LMFT resume trick).
* BN -- batch_stats updated every microbatch sequentially through the scan
  (reference updates per session.run); statistics are global-batch under pjit
  (sync-BN) instead of per-replica.

Precision: bf16 activations (TPU-native, replacing TF AMP), fp32 params,
fp32 grad accumulation, fp32 margin/softmax math.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.struct
import optax

from ..losses import schedules
from ..ops.specaug import spec_augment
from .config import TrainConfig
from .speaker_net import SpeakerNet


@flax.struct.dataclass
class TrainState:
    step: jax.Array            # int32 global optimizer step
    params: Any
    batch_stats: Any
    momentum: Any              # SGD momentum trace, fp32


def build_speaker_net(config: TrainConfig) -> SpeakerNet:
    return SpeakerNet(
        model_name=config.model,
        projection_id=config.projection,
        num_classes=config.num_classes,
        num_centers=config.num_centers,
        dtype=jnp.bfloat16 if config.bf16 else None,
        remat=config.remat,
        remat_policy=config.remat_policy,
        remat_stages=config.remat_stages,
        remat_keep_blocks=config.remat_keep_blocks,
        bn_groups=config.bn_groups,
    )


def create_train_state(config: TrainConfig, rng: jax.Array) -> TrainState:
    net = build_speaker_net(config)

    # One jitted init graph: eager flax init would dispatch one executable per
    # parameter, which is pathological over a remote-TPU tunnel.
    @jax.jit
    def init(key):
        feats = jnp.zeros((1, config.feat_length, config.feat_dim), jnp.float32)
        labels = jnp.zeros((1,), jnp.int32)
        variables = net.init(key, feats, labels, config.scale, 0.0, True)
        params = variables["params"]
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=variables.get("batch_stats", {}),
            momentum=jax.tree.map(lambda p: jnp.zeros_like(p, jnp.float32), params),
        )

    return init(rng)


def _kernel_sq_norm(params: Any) -> jax.Array:
    return sum(
        jnp.sum(jnp.square(p.astype(jnp.float32)))
        for p in jax.tree.leaves(params)
    )


def make_train_step(config: TrainConfig):
    """Returns step(state, features, labels, rng) -> (state, metrics).

    features: (A, B, T, F) fp32, labels: (A, B) int32, A = accumulation steps.
    Wrap with jax.jit + shardings at the call site (see Trainer / graft entry).
    """
    net = build_speaker_net(config)
    epoch = config.epoch_size
    lr_bounds = [epoch * b for b in config.lr_boundaries_epochs]
    margin_bounds = [epoch * b for b in config.margin_boundaries_epochs]
    if config.raw_audio:
        from ..ops.fbank import FbankConfig
        from ..ops.pipeline import waveform_to_features
        fbank_cfg = FbankConfig(num_bins=config.feat_dim, dither=config.dither)

    def step_fn(
        state: TrainState,
        features,
        labels: jax.Array,
        rng: jax.Array,
    ) -> Tuple[TrainState, Dict[str, jax.Array]]:
        # features: (A, B, T, F) precomputed, or in raw-audio mode the tuple
        # (waves (A, B, S), num_samples, target_offset, pad_shift) each (A, B)
        assert labels.ndim == 2
        assert isinstance(features, tuple) if config.raw_audio \
            else features.ndim == 4
        if config.lr_schedule == "cosine":
            lr = schedules.warmup_constant_cosine_decay(
                config.learning_rate, state.step, lr_bounds
            )
        else:
            lr = schedules.warmup_constant_exponential_decay(
                config.learning_rate, state.step, lr_bounds, epoch,
                decay_rate=config.decay_rate,
            )
        margin = schedules.zero_linear_constant(
            config.margin, state.step, margin_bounds, epoch
        )

        def loss_fn(params, batch_stats, feats, labs, key):
            if config.raw_audio:
                waves, ns, off, shift = feats
                key, dkey = jax.random.split(key)
                feats = waveform_to_features(
                    waves, ns, off, shift, fbank_cfg, config.feat_length,
                    window=config.cmn_window, context=config.cmn_context,
                    dither_key=dkey if config.dither else None,
                )
            if config.specaug:
                feats = spec_augment(key, feats)
            (emb, logits), mutated = net.apply(
                {"params": params, "batch_stats": batch_stats},
                feats, labs, config.scale, margin, True,
                mutable=["batch_stats"],
            )
            logits = logits.astype(jnp.float32)
            ce = optax.softmax_cross_entropy_with_integer_labels(logits, labs).mean()
            acc = jnp.mean((jnp.argmax(logits, axis=-1) == labs).astype(jnp.float32))
            return ce, (mutated["batch_stats"], acc)

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

        def micro(carry, xs):
            gsum, batch_stats = carry
            feats, labs, key = xs
            (ce, (batch_stats, acc)), grads = grad_fn(
                state.params, batch_stats, feats, labs, key
            )
            gsum = jax.tree.map(
                lambda a, g: a + g.astype(jnp.float32), gsum, grads
            )
            return (gsum, batch_stats), (ce, acc)

        zeros = jax.tree.map(
            lambda p: jnp.zeros(p.shape, jnp.float32), state.params
        )
        num_accum = jax.tree.leaves(features)[0].shape[0]
        keys = jax.random.split(jax.random.fold_in(rng, state.step), num_accum)
        (gsum, batch_stats), (ces, accs) = jax.lax.scan(
            micro, (zeros, state.batch_stats), (features, labels, keys)
        )

        # Mean over microbatches (= ref's sum of grads of loss/A), plus the
        # closed-form l2 gradient (ref graph-collection reg losses).
        inv_a = 1.0 / num_accum
        grads = jax.tree.map(
            lambda g, p: g * inv_a + config.l2_scale * p.astype(jnp.float32),
            gsum, state.params,
        )

        # Global-norm clip 1.0 after accumulation (ref tf_train_tdnn.py:253).
        gnorm = optax.global_norm(grads)
        clip = jnp.minimum(1.0, config.clip_norm / (gnorm + 1e-12))
        grads = jax.tree.map(lambda g: g * clip, grads)

        # SGD momentum (trace form == tf.train.MomentumOptimizer).
        momentum = jax.tree.map(
            lambda m, g: config.momentum * m + g, state.momentum, grads
        )
        params = jax.tree.map(
            lambda p, m: (p.astype(jnp.float32) - lr * m).astype(p.dtype),
            state.params, momentum,
        )

        reg_loss = config.l2_scale * 0.5 * _kernel_sq_norm(state.params)
        metrics = {
            "classification_loss": jnp.mean(ces),
            "regularization_loss": reg_loss,
            "loss": jnp.mean(ces) + reg_loss,
            "accuracy": jnp.mean(accs),
            "learning_rate": lr,
            "margin": schedules.total_margin(config.projection, margin),
            "gradient_norm": gnorm,
        }
        new_state = TrainState(
            step=state.step + 1,
            params=params,
            batch_stats=batch_stats,
            momentum=momentum,
        )
        return new_state, metrics

    return step_fn


def make_embed_fn(config: TrainConfig):
    """Inference embedding fn(params, batch_stats, feats, mask) -> (B, D)."""
    net = build_speaker_net(config)

    def embed(params, batch_stats, feats, mask=None):
        # Upcast on device: extraction may ship a bf16 wire format (half the
        # host->device bytes, eval/extract.py:pack_chunk_batch); the model
        # re-casts to its own compute dtype, so for bf16 models the wire
        # dtype is numerically invisible.
        feats = feats.astype(jnp.float32)
        return net.apply(
            {"params": params, "batch_stats": batch_stats},
            feats, mask, method=SpeakerNet.embed,
        )

    return embed
