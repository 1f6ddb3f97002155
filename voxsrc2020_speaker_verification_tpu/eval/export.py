"""Inference-artifact export.

Reference equivalents:

* frozen inference graph (`export_inference_graph.py:40-66` +
  `freeze_graph`, export_inference_model.sh:29-49) -> an **inference
  artifact** directory: inference variables (params + batch_stats) as an
  orbax checkpoint, the TrainConfig as JSON, and optionally `jax.export`
  StableHLO functions serialized per extraction bucket shape (static-shape
  buckets replace the reference's [None, None, F] dynamic graph -- see
  eval/extract.py for why).
* cohort/projection-weight export (`export_projection_weight.py:28-49`):
  the classifier kernel's rows, l2-normalized, double as cohort speaker
  embeddings: kernel [K, emb, C] -> swapaxes(-1, -2) -> (K*C, emb) ->
  row-l2norm.
"""

from __future__ import annotations

import dataclasses
import json
import os
import pickle
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..training.config import TrainConfig
from ..training.trainer import TrainState, build_speaker_net
from .scoring import l2norm


def export_projection_weights(params, path: Optional[str] = None) -> np.ndarray:
    """Classifier rows as cohort embeddings (ref export_projection_weight.py:28-35)."""
    kernel = np.asarray(params["projection"]["kernel"], np.float32)
    w = np.swapaxes(kernel, -1, -2).reshape(-1, kernel.shape[-2])
    w = l2norm(w, axis=1)
    if path:
        with open(path, "wb") as f:
            pickle.dump(w, f)
    return w


def export_inference_artifact(
    config: TrainConfig,
    state: TrainState,
    out_dir: str,
    *,
    stablehlo_buckets: Sequence[Tuple[int, int]] = (),
) -> str:
    """Write an inference artifact: variables + config (+ optional serialized
    StableHLO embed functions at (batch, frames) bucket shapes for
    model-code-free serving)."""
    import orbax.checkpoint as ocp

    out_dir = os.path.abspath(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    variables = {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
    }
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.join(out_dir, "variables"), variables, force=True)
    ckptr.wait_until_finished()
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump({**dataclasses.asdict(config), "step": int(state.step)}, f,
                  indent=2)

    if stablehlo_buckets:
        from jax import export as jax_export

        net = build_speaker_net(config)

        def embed(feats, mask):
            from ..training.speaker_net import SpeakerNet
            return net.apply(
                {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]},
                feats, mask, method=SpeakerNet.embed,
            )

        for b, t in stablehlo_buckets:
            exp = jax_export.export(jax.jit(embed))(
                jax.ShapeDtypeStruct((b, t, config.feat_dim), jnp.float32),
                jax.ShapeDtypeStruct((b, t), jnp.float32),
            )
            with open(os.path.join(out_dir, f"embed_b{b}_t{t}.stablehlo"), "wb") as f:
                f.write(exp.serialize())

    export_projection_weights(
        variables["params"], os.path.join(out_dir, "projection_weight.pkl")
    )
    return out_dir


def load_inference_artifact(artifact_dir: str, mesh=None):
    """-> (config, embed_fn(feats (B,T,F), mask (B,T)) -> (B, D) jitted).

    With ``mesh`` (a 1-D ``jax.sharding.Mesh``), the embed fn is GSPMD
    data-parallel: variables replicated, the batch axis sharded over the
    mesh -- the TPU-native replacement for the reference's one-process-per-
    GPU extraction fan-out (ref eval_inference_model.sh:27-40).  Numerics
    are identical to single-device; batches must be divisible by the mesh
    size (make_bucketed_embed_fn's fixed batch padding guarantees this).
    """
    import orbax.checkpoint as ocp

    config = TrainConfig.from_json(os.path.join(artifact_dir, "config.json"))

    ckptr = ocp.StandardCheckpointer()
    variables = ckptr.restore(os.path.join(os.path.abspath(artifact_dir), "variables"))

    net = build_speaker_net(config)
    from ..training.speaker_net import SpeakerNet

    def apply(feats, mask):
        # device-side upcast: accepts the bf16 wire format
        # (eval/extract.py:pack_chunk_batch) as well as fp32
        feats = feats.astype(jnp.float32)
        return net.apply(
            {"params": variables["params"], "batch_stats": variables["batch_stats"]},
            feats, mask, method=SpeakerNet.embed,
        )

    if mesh is None:
        return config, jax.jit(apply)

    from jax.sharding import NamedSharding, PartitionSpec as P

    axis = mesh.axis_names[0]
    batch = NamedSharding(mesh, P(axis))
    variables = jax.device_put(variables, NamedSharding(mesh, P()))
    embed = jax.jit(apply, in_shardings=(batch, batch), out_shardings=batch)
    return config, embed
