"""Typed training configuration.

One dataclass replaces the reference's three config tiers (global_config.sh,
24 positional shell args of run_tf_train_local.sh:47-70, per-recipe constants)
and derives the same experiment naming scheme
(``exp/<dataset>/<model>_<loss>_frames<N>_scale<S>_margin<M>_<G>chips``,
ref run_res2net_local_vox2_dev_aug.sh:40).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

from ..losses.schedules import base_learning_rate


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    # model / loss
    model: str = "res2net50_w24_s4_c32"
    projection: str = "sc_cm_linear"
    num_classes: int = 5994
    num_centers: int = 2
    scale: float = 32.0
    margin: float = 0.2

    # data
    dataset: str = "voxceleb2_dev_aug"
    dataset_length: int = 5_460_045
    feat_dim: int = 80
    feat_length: int = 200

    # optimization (effective global batch = batch_size * num_accumulation_steps)
    batch_size: int = 256            # global per-microbatch (ref: 32 x 8 ranks)
    num_accumulation_steps: int = 4
    total_epochs: int = 23
    momentum: float = 0.9
    clip_norm: float = 1.0
    l2_scale: float = 1e-3
    base_lr: Optional[float] = None  # default: 0.08/128 * effective batch
    lr_schedule: str = "exp"  # "exp" | "cosine" (ref tf_scheduler.py:48-105)
    lr_boundaries_epochs: tuple = (3, 13, 23)
    margin_boundaries_epochs: tuple = (3, 13)
    decay_rate: float = 0.5

    # precision / regularization
    bf16: bool = True
    specaug: bool = False
    remat: bool = False   # per-block rematerialization (large models / batches)
    remat_stages: Optional[tuple] = None  # with remat: apply only to these
                          # 0-based res2net stages (early stages hold the
                          # biggest activations; (0, 1) is the sweet spot)
    remat_policy: Optional[str] = None  # jax.checkpoint_policies name for
                          # selective remat, e.g. "dots_saveable" keeps MXU
                          # outputs and recomputes only elementwise chains
    remat_keep_blocks: Optional[tuple] = None  # (stage, block) pairs kept
                          # resident inside remat'd stages -- spends spare
                          # HBM headroom to skip those blocks' recompute
    bn_groups: int = 1    # 1 = global-batch (sync) BN statistics; set to the
                          # data-shard count for the reference's per-replica
                          # BN semantics (deterministic in the group count,
                          # not the physical chip count)

    # raw-audio mode: waveform crops in, FBANK+CMVN on device
    # (ops/pipeline.py); dither matches the reference's offline
    # compute-fbank-feats default of 1.0 (conf/fbank80.conf implies it)
    raw_audio: bool = False
    dither: float = 1.0
    cmn_window: int = 300
    cmn_context: int = 150

    # parallelism
    num_model_shards: int = 1

    # io
    exp_root: str = "exp"
    seed: int = 0

    @property
    def effective_batch(self) -> int:
        return self.batch_size * self.num_accumulation_steps

    @property
    def epoch_size(self) -> int:
        """Optimizer steps per epoch (ref tf_train_tdnn.py:150,172)."""
        return self.dataset_length // self.effective_batch

    @property
    def total_steps(self) -> int:
        return self.epoch_size * self.total_epochs

    @property
    def learning_rate(self) -> float:
        if self.base_lr is not None:
            return self.base_lr
        return base_learning_rate(self.effective_batch)

    @property
    def exp_name(self) -> str:
        return (
            f"{self.model}_{self.projection}_frames{self.feat_length}"
            f"_scale{self.scale:g}_margin{self.margin:g}"
        )

    @property
    def exp_dir(self) -> str:
        return f"{self.exp_root}/{self.dataset}/{self.exp_name}"

    def to_json(self, path: str) -> None:
        import json
        with open(path, "w") as f:
            json.dump(dataclasses.asdict(self), f, indent=2)

    @classmethod
    def from_json(cls, path: str) -> "TrainConfig":
        import json
        with open(path) as f:
            raw = json.load(f)
        names = {f.name for f in dataclasses.fields(cls)}
        return cls(**{
            k: (tuple(v) if isinstance(v, list) else v)
            for k, v in raw.items() if k in names
        })
