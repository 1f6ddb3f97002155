"""Recipe registry: typed equivalents of every reference run_*.sh.

Each recipe returns ``(TrainConfig, resume_from)`` where ``resume_from`` is
the pretrain experiment dir for LMFT finetunes (the reference implements this
by symlinking the pretrain dir so the restored global step lands in the
x1/128 learning-rate tail, run_res2net_finetune_local_vox2_dev.sh:39-53).

Batch accounting: the reference's per-GPU ``batch_size`` x 8 GPUs becomes
one global per-microbatch ``batch_size`` here (sharded over the ``data``
mesh axis); effective batch = 1024 in every recipe, matching
``dataset_length // 32 // 4 // 8`` step counts (SURVEY.md §2 dataset table).

BN policy: every reference-parity recipe sets ``bn_groups=8`` so batch-norm
statistics are computed per group of ``batch_size/8`` examples -- the
reference's per-replica BN at world size 8 (ref models.py:62-73; sync-BN is
commented out there).  This keeps the BN-statistics noise scale identical
to the reference runs whose EERs BASELINE.md records, independent of how
many physical chips the batch is sharded over.  Extension recipes (ecapa)
keep global sync-BN (``bn_groups=1``).

| recipe                          | reference script                                  |
|---------------------------------|---------------------------------------------------|
| res2net_vox2_dev_aug            | run_res2net_local_vox2_dev_aug.sh                 |
| res2net_finetune_vox2_dev       | run_res2net_finetune_local_vox2_dev.sh (LMFT)     |
| dpn_vox2_dev_aug                | run_dpn_local_vox2_dev_aug.sh                     |
| dpn_finetune_vox2_dev           | run_dpn_finetune_local_vox2_dev.sh (LMFT)         |
| tdnn_voxsrc2020_vox2_dev_aug    | scripts_for_40.../run_tdnn_local_voxsrc2020_vox2_dev_aug.sh |
| tdnn_voxsrc2020_vox2_dev        | scripts_for_40.../run_tdnn_local_voxsrc2020_vox2_dev.sh |
| tdnn_voxsrc2020_vox1_dev_aug    | scripts_for_40.../run_tdnn_local_voxsrc2020_vox1_dev_aug.sh |
| dpn_voxsrc2020_vox2_dev_aug     | scripts_for_40.../run_dpn_local_voxsrc2020_vox2_dev_aug.sh |
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Tuple

from ..training.config import TrainConfig

VOX2_DEV_UTTS = 1_092_009   # ref run_res2net_local_vox2_dev_aug.sh:32
VOX2_DEV_SPEAKERS = 5994
VOX1_DEV_UTTS = 148_642     # ref scripts_for_40.../run_tdnn_local_voxsrc2020_vox1_dev_aug.sh:33
VOX1_DEV_SPEAKERS = 1211

RecipeFn = Callable[..., Tuple[TrainConfig, Optional[str]]]
RECIPES: Dict[str, RecipeFn] = {}


def recipe(name: str):
    def wrap(fn: RecipeFn) -> RecipeFn:
        RECIPES[name] = fn
        return fn
    return wrap


def _apply(config: TrainConfig, overrides) -> TrainConfig:
    if overrides:
        config = dataclasses.replace(config, **overrides)
    if config.batch_size % config.bn_groups:
        # batch overridden below the recipe's group count (smoke runs):
        # keep per-replica semantics at the largest feasible group count
        import math
        config = dataclasses.replace(
            config, bn_groups=math.gcd(config.batch_size, config.bn_groups))
    return config


@recipe("res2net_vox2_dev_aug")
def res2net_vox2_dev_aug(model: str = "res2net50_w24_s4_c64", **overrides):
    """Pretrain on 5x-augmented VoxCeleb2-dev (ref run_res2net_local_vox2_dev_aug.sh:19-43)."""
    cfg = TrainConfig(
        model=model, projection="sc_cm_linear", scale=32.0, margin=0.2,
        num_classes=VOX2_DEV_SPEAKERS, dataset="voxceleb2_dev_aug",
        dataset_length=VOX2_DEV_UTTS * 5, feat_dim=80, feat_length=200,
        batch_size=256, num_accumulation_steps=4, total_epochs=23,
        bn_groups=8,
    )
    return _apply(cfg, overrides), None


@recipe("res2net_finetune_vox2_dev")
def res2net_finetune_vox2_dev(model: str = "res2net50_w24_s4_c64", **overrides):
    """LMFT: continue from the pretrain dir at margin 0.4 / 600 frames on
    non-augmented data; dataset_length deliberately stays 5x (ref
    run_res2net_finetune_local_vox2_dev.sh:30-46) so total_epochs=24 yields
    exactly one extra epoch at LR/128."""
    pretrain, _ = res2net_vox2_dev_aug(model)
    cfg = dataclasses.replace(
        pretrain, dataset="voxceleb2_dev", margin=0.4, feat_length=600,
        batch_size=128, num_accumulation_steps=8, total_epochs=24,
    )
    return _apply(cfg, overrides), pretrain.exp_dir


@recipe("dpn_vox2_dev_aug")
def dpn_vox2_dev_aug(model: str = "dpn68", **overrides):
    """ref run_dpn_local_vox2_dev_aug.sh:19-43."""
    return res2net_vox2_dev_aug(model, **overrides)


@recipe("dpn_finetune_vox2_dev")
def dpn_finetune_vox2_dev(model: str = "dpn68", **overrides):
    """ref run_dpn_finetune_local_vox2_dev.sh:30-53."""
    return res2net_finetune_vox2_dev(model, **overrides)


def _voxsrc2020(model, _dataset, _dataset_length, _num_classes, **overrides):
    cfg = TrainConfig(
        model=model, projection="cm_linear_voxsrc2020", scale=32.0, margin=0.2,
        num_classes=_num_classes, dataset=_dataset, dataset_length=_dataset_length,
        feat_dim=40, feat_length=320,
        batch_size=1024, num_accumulation_steps=1, total_epochs=23,
        bn_groups=8,
    )
    return _apply(cfg, overrides), None


@recipe("tdnn_voxsrc2020_vox2_dev_aug")
def tdnn_voxsrc2020_vox2_dev_aug(model: str = "tdnn", **overrides):
    """40-d / 320-frame VoxSRC2020 track (ref scripts_for_40.../run_tdnn_local_voxsrc2020_vox2_dev_aug.sh)."""
    return _voxsrc2020(model, "voxceleb2_dev_aug", VOX2_DEV_UTTS * 5,
                       VOX2_DEV_SPEAKERS, **overrides)


@recipe("tdnn_voxsrc2020_vox2_dev")
def tdnn_voxsrc2020_vox2_dev(model: str = "tdnn", **overrides):
    """Non-aug variant; dataset_length stays 5x per the reference script
    (ref scripts_for_40.../run_tdnn_local_voxsrc2020_vox2_dev.sh:32-34)."""
    return _voxsrc2020(model, "voxceleb2_dev", VOX2_DEV_UTTS * 5,
                       VOX2_DEV_SPEAKERS, **overrides)


@recipe("tdnn_voxsrc2020_vox1_dev_aug")
def tdnn_voxsrc2020_vox1_dev_aug(model: str = "tdnn", **overrides):
    """VoxCeleb1-dev 1211-class variant (ref scripts_for_40.../run_tdnn_local_voxsrc2020_vox1_dev_aug.sh:32-34)."""
    return _voxsrc2020(model, "voxceleb1_dev_aug", VOX1_DEV_UTTS * 5,
                       VOX1_DEV_SPEAKERS, **overrides)


@recipe("ecapa_vox2_dev_aug")
def ecapa_vox2_dev_aug(model: str = "ecapa_tdnn_512", **overrides):
    """Framework extension (no reference counterpart): ECAPA-TDNN on
    5x-augmented VoxCeleb2-dev with AAM-softmax (arXiv:2005.07143 §3 uses
    AAM s=30 m=0.2; we keep this framework's s=32 and margin schedule)."""
    cfg = TrainConfig(
        model=model, projection="aam_linear", scale=32.0, margin=0.2,
        num_classes=VOX2_DEV_SPEAKERS, dataset="voxceleb2_dev_aug",
        dataset_length=VOX2_DEV_UTTS * 5, feat_dim=80, feat_length=200,
        batch_size=256, num_accumulation_steps=4, total_epochs=23,
        specaug=True,
    )
    return _apply(cfg, overrides), None


@recipe("dpn_voxsrc2020_vox2_dev_aug")
def dpn_voxsrc2020_vox2_dev_aug(model: str = "dpn68", **overrides):
    """ref scripts_for_40.../run_dpn_local_voxsrc2020_vox2_dev_aug.sh."""
    return _voxsrc2020(model, "voxceleb2_dev_aug", VOX2_DEV_UTTS * 5,
                       VOX2_DEV_SPEAKERS, **overrides)


# Measured-best single-chip shapes (v5e, PERF.md round-2..4 sweeps), keyed
# by (model, feat_length).  Recipes keep the reference's global-batch shape
# (256-sample microbatches) for BN-statistics parity; on ONE chip these
# overrides are 15-25% faster or are the only shapes that fit at all (the
# att flagships' 256/128-sample microbatches exceed v5e HBM).  Effective
# batch stays 1024 everywhere, and bn_groups is set so the BN-statistics
# group size keeps the reference's per-replica semantics (32 samples on
# the f200/f320 pretrain legs, 16 on the f600 LMFT legs -- ref bs 32 or
# 16 per GPU x 8) even though the microbatch changed.
SINGLE_CHIP_SHAPES = {
    ("res2net50_w8_s6_c16", 200): dict(
        batch_size=256, num_accumulation_steps=4, remat=False, bn_groups=8),
    # f600 no-remat OOMs at any microbatch; 128x8 stage-remat crashes the
    # worker (the f600 small-batch fault class, PERF.md) -- 256x4 works.
    ("res2net50_w8_s6_c16", 600): dict(
        batch_size=256, num_accumulation_steps=4, remat=True,
        remat_stages=(0, 1, 2), bn_groups=16),
    # c64 (the default model of res2net_vox2_dev_aug): 256x4 OOMs no-remat
    # AND stage-remat at f200; 128x8 no-remat is the one fast f200 shape.
    ("res2net50_w24_s4_c64", 200): dict(
        batch_size=128, num_accumulation_steps=8, remat=False, bn_groups=4),
    # f600: every 128x8 remat variant OOMs; 64x16 stage-remat works
    # (374 audio-s/s, beats whole-block 369).
    ("res2net50_w24_s4_c64", 600): dict(
        batch_size=64, num_accumulation_steps=16, remat=True,
        remat_stages=(0, 1, 2), bn_groups=4),
    ("res2net50_w24_s4_c32", 200): dict(
        batch_size=128, num_accumulation_steps=8, remat=False, bn_groups=4),
    ("res2net50_w24_s4_c32", 600): dict(
        batch_size=128, num_accumulation_steps=8, remat=True,
        remat_stages=(0, 1, 2), bn_groups=8),
    ("res2net101_w24_s4_c32_att", 200): dict(
        batch_size=64, num_accumulation_steps=16, remat=False, bn_groups=2),
    ("res2net101_w24_s4_c32_att", 600): dict(
        batch_size=64, num_accumulation_steps=16, remat=True,
        remat_stages=(0, 1, 2), bn_groups=4),
    ("res2net152_w24_s4_c32_att", 200): dict(
        batch_size=64, num_accumulation_steps=16, remat=False, bn_groups=2),
    # NB: stage-selective (0,1,2) remat is pathological here (77 s/step vs
    # 23.6 whole-block -- keeping stage 3 resident pushes HBM to the edge
    # and the scheduler thrashes); whole-block is the measured shape.
    ("res2net152_w24_s4_c32_att", 600): dict(
        batch_size=64, num_accumulation_steps=16, remat=True, bn_groups=4),
    ("res2net200_w24_s4_c32_att", 200): dict(
        batch_size=32, num_accumulation_steps=32, remat=False, bn_groups=1),
    # 64x16 OOMs even whole-block; "32x32 + remat" crashes the TPU worker
    # (reproducible, round-2 and round-4); 16x64 is the shape that works.
    ("res2net200_w24_s4_c32_att", 600): dict(
        batch_size=16, num_accumulation_steps=64, remat=True,
        remat_stages=(0, 1, 2), bn_groups=1),
    ("dpn68", 200): dict(
        batch_size=128, num_accumulation_steps=8, remat=False, bn_groups=4),
    # dpn68's f600 LMFT leg OOMs no-remat at every microbatch (128/64) and
    # at 128x8 with any remat; DPN grew the res2net remat knobs in round 5
    # for exactly this shape.
    ("dpn68", 600): dict(
        batch_size=64, num_accumulation_steps=16, remat=True,
        remat_stages=(0, 1, 2), bn_groups=4),
    ("tdnn", 320): dict(
        batch_size=1024, num_accumulation_steps=1, remat=False, bn_groups=8),
}


def single_chip_shape(model: str, feat_length: int) -> dict:
    """Measured-best (batch, accum, remat) overrides for one v5e chip, or {}
    if the recipe default is already the best known shape."""
    return dict(SINGLE_CHIP_SHAPES.get((model, feat_length), {}))


def get_recipe(name: str, model: Optional[str] = None, single_chip: bool = False,
               **overrides):
    fn = RECIPES[name]
    config, resume = fn(model, **overrides) if model else fn(**overrides)
    if single_chip:
        shape = single_chip_shape(config.model, config.feat_length)
        # Explicit user overrides win over the shape table.  batch_size and
        # num_accumulation_steps form ONE shape: if the user pins either,
        # drop BOTH table keys, else a partial merge silently changes the
        # effective batch (and with it step counts and the derived LR).
        if {"batch_size", "num_accumulation_steps"} & set(overrides):
            shape.pop("batch_size", None)
            shape.pop("num_accumulation_steps", None)
        shape = {k: v for k, v in shape.items() if k not in overrides}
        if shape:
            config = _apply(config, shape)
    return config, resume
