"""Checkpoint/resume, recipe registry, and fit() loop tests.

Validates the reference's training-runtime contracts (SURVEY.md §5.4):
per-epoch checkpoints, auto-resume, the LMFT resume-from-pretrain trick
(schedules keyed off the restored global step), and the recipe constants
that reproduce the reference's published step counts (README.md:131,164).
"""

import dataclasses
import os

import jax
import numpy as np
import pytest

from voxsrc2020_speaker_verification_tpu.data import BatchFeeder, SyntheticDataset
from voxsrc2020_speaker_verification_tpu.recipes import RECIPES, get_recipe
from voxsrc2020_speaker_verification_tpu.training import (
    TrainConfig, create_train_state,
)
from voxsrc2020_speaker_verification_tpu.training.checkpoint import (
    CheckpointManager, restore_or_init,
)
from voxsrc2020_speaker_verification_tpu.training.loop import fit


TINY = TrainConfig(
    model="tdnn", projection="sc_cm_linear", num_classes=8,
    dataset_length=64, feat_dim=40, feat_length=24,
    batch_size=4, num_accumulation_steps=2, total_epochs=23,
    bf16=False, exp_root="",
)


def _batches(config, n=100):
    rng = np.random.RandomState(0)
    a, b = config.num_accumulation_steps, config.batch_size
    for _ in range(n):
        yield (
            rng.rand(a, b, config.feat_length, config.feat_dim).astype(np.float32),
            rng.randint(0, config.num_classes, (a, b)).astype(np.int32),
        )


class TestRecipes:
    def test_all_effective_batch_1024(self):
        for name in RECIPES:
            cfg, _ = get_recipe(name)
            assert cfg.effective_batch == 1024, name

    def test_reference_step_counts(self):
        # README.md:131 — pretrain checkpoint at step 122636
        cfg, resume = get_recipe("res2net_vox2_dev_aug", model="res2net50_w24_s4_c32")
        assert resume is None
        assert cfg.total_steps == 122_636
        # README.md:164 — LMFT checkpoint at step 127968
        cfg, resume = get_recipe("res2net_finetune_vox2_dev", model="res2net50_w24_s4_c32")
        assert cfg.total_steps == 127_968
        assert resume is not None and "voxceleb2_dev_aug" in resume
        assert cfg.margin == 0.4 and cfg.feat_length == 600

    def test_lmft_lands_in_lr_tail(self):
        # restored pretrain step (122636) must be past the last LR boundary
        # of the finetune config: the whole finetune epoch runs at LR/128
        # (ref tf_scheduler.py:72-73 via the symlinked exp dir).
        cfg, _ = get_recipe("res2net_finetune_vox2_dev")
        assert cfg.epoch_size * cfg.lr_boundaries_epochs[-1] <= 122_636

    def test_voxsrc2020_recipes(self):
        cfg, _ = get_recipe("tdnn_voxsrc2020_vox1_dev_aug")
        assert cfg.feat_dim == 40 and cfg.feat_length == 320
        assert cfg.num_classes == 1211
        assert cfg.projection == "cm_linear_voxsrc2020"
        assert cfg.dataset_length == 148_642 * 5

    def test_single_chip_shapes(self):
        from voxsrc2020_speaker_verification_tpu.recipes import (
            SINGLE_CHIP_SHAPES,
        )
        # effective batch stays 1024 in every measured shape, and the BN
        # group size preserves the reference's per-replica semantics:
        # 32 samples on pretrain legs, 16 on f600 LMFT (ref bs 32/16 x 8);
        # exceptions: the w8 model (single-GPU reference) and the TDNN
        # (per-replica 128) keep their own reference group sizes
        for (model, frames), shape in SINGLE_CHIP_SHAPES.items():
            assert shape["batch_size"] * shape["num_accumulation_steps"] \
                == 1024, (model, frames)
            group = shape["batch_size"] // shape["bn_groups"]
            want = {("res2net50_w8_s6_c16", 200): 32,
                    ("tdnn", 320): 128}.get(
                        (model, frames), 16 if frames == 600 else 32)
            assert group == want, (model, frames, group)
        # --single-chip applies the table and keeps schedules/step counts
        base, _ = get_recipe("res2net_vox2_dev_aug",
                             model="res2net50_w24_s4_c32")
        cfg, _ = get_recipe("res2net_vox2_dev_aug",
                            model="res2net50_w24_s4_c32", single_chip=True)
        assert (cfg.batch_size, cfg.num_accumulation_steps) == (128, 8)
        assert cfg.total_steps == base.total_steps
        assert cfg.learning_rate == base.learning_rate
        # explicit overrides beat the table -- and pinning EITHER of
        # batch_size/num_accumulation_steps drops BOTH from the table, so a
        # partial merge can never silently change the effective batch
        # (ADVICE r4: 64 x table-8 = 512 vs the recipe's 1024)
        cfg, _ = get_recipe("res2net_vox2_dev_aug",
                            model="res2net50_w24_s4_c32", single_chip=True,
                            batch_size=64)
        assert cfg.batch_size == 64
        assert cfg.num_accumulation_steps == base.num_accumulation_steps
        cfg, _ = get_recipe("res2net_vox2_dev_aug",
                            model="res2net50_w24_s4_c32", single_chip=True,
                            num_accumulation_steps=2)
        assert cfg.batch_size == base.batch_size
        assert cfg.num_accumulation_steps == 2
        # non-shape table keys (remat/bn_groups) still apply under a
        # partial batch override
        assert cfg.bn_groups == SINGLE_CHIP_SHAPES[
            ("res2net50_w24_s4_c32", 200)]["bn_groups"]
        # LMFT leg picks the f600 shape (stage-selective remat)
        cfg, _ = get_recipe("res2net_finetune_vox2_dev",
                            model="res2net50_w24_s4_c32", single_chip=True)
        assert cfg.remat and cfg.remat_stages == (0, 1, 2)
        # unknown model/frames: recipe default untouched
        cfg, _ = get_recipe("ecapa_vox2_dev_aug", single_chip=True)
        assert cfg.batch_size == 256


class TestCheckpoint:
    def test_roundtrip_and_latest(self, tmp_path):
        state = create_train_state(TINY, jax.random.PRNGKey(0))
        mgr = CheckpointManager(str(tmp_path / "exp"))
        state = dataclasses.replace(state, step=state.step + 3)
        mgr.save(state)
        mgr.wait()
        assert mgr.latest_step() == 3
        fresh = create_train_state(TINY, jax.random.PRNGKey(1))
        restored = mgr.restore(fresh)
        mgr.close()
        assert int(restored.step) == 3
        for a, b in zip(jax.tree.leaves(restored.params),
                        jax.tree.leaves(state.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_restore_or_init_fresh(self, tmp_path):
        state = create_train_state(TINY, jax.random.PRNGKey(0))
        out, mgr = restore_or_init(state, str(tmp_path / "exp"))
        mgr.close()
        assert int(out.step) == 0

    def test_restore_or_init_lmft(self, tmp_path):
        # pretrain dir has a checkpoint at step 5; a *new* exp dir with
        # resume_from=pretrain restores it (global step continues).
        state = create_train_state(TINY, jax.random.PRNGKey(0))
        pre = CheckpointManager(str(tmp_path / "pretrain"))
        pre.save(dataclasses.replace(state, step=state.step + 5))
        pre.close()
        out, mgr = restore_or_init(
            state, str(tmp_path / "finetune"),
            resume_from=str(tmp_path / "pretrain"),
        )
        mgr.close()
        assert int(out.step) == 5


class TestFit:
    def test_fit_runs_and_resumes(self, tmp_path):
        exp = str(tmp_path / "exp")
        # epoch_size = 64 // 8 = 8 -> 2 steps is mid-epoch
        r1 = fit(TINY, _batches(TINY), exp_dir=exp, log_every=0, max_steps=2)
        assert r1.steps_run == 2 and int(r1.state.step) == 2
        # resumes from the end-of-run checkpoint
        r2 = fit(TINY, _batches(TINY), exp_dir=exp, log_every=0, max_steps=2)
        assert int(r2.state.step) == 4
        assert np.isfinite(float(jax.tree.leaves(r2.state.params)[0].sum()))

    def test_fit_stops_at_total_steps(self, tmp_path):
        cfg = dataclasses.replace(TINY, total_epochs=1)  # total_steps = 8
        r = fit(cfg, _batches(cfg), exp_dir=str(tmp_path / "e"),
                log_every=0, max_steps=100)
        assert int(r.state.step) == cfg.total_steps == 8

    def test_fit_with_feeder(self, tmp_path):
        sources = [SyntheticDataset(TINY.feat_dim, TINY.feat_length,
                                    TINY.num_classes, seed=i) for i in range(2)]
        feeder = BatchFeeder(sources, TINY.batch_size,
                             TINY.num_accumulation_steps).start()
        try:
            r = fit(TINY, feeder, exp_dir=str(tmp_path / "e"),
                    log_every=0, max_steps=2, checkpoint=False)
            assert r.steps_run == 2
        finally:
            feeder.stop()


class TestTrainCLI:
    def test_synthetic_smoke(self, tmp_path, monkeypatch, capsys):
        from voxsrc2020_speaker_verification_tpu.cli import train as cli_train
        monkeypatch.chdir(tmp_path)
        cli_train.main([
            "--recipe", "tdnn_voxsrc2020_vox2_dev", "--synthetic",
            "--max-steps", "1", "--log-every", "0", "--no-checkpoint",
            "--batch-size", "4", "--num-accumulation-steps", "1",
            "--feat-length", "24",
        ])
        assert "done: 1 steps" in capsys.readouterr().out

    def test_num_workers_default_adapts_to_cores(self):
        from voxsrc2020_speaker_verification_tpu.cli.train import (
            build_parser, resolve_num_workers,
        )
        # parser leaves the default unresolved (None) ...
        args = build_parser().parse_args(
            ["--recipe", "res2net_vox2_dev_aug", "--synthetic"])
        assert args.num_workers is None
        # ... main() resolves it to min(4, cores) with a floor of 1
        assert resolve_num_workers(None, cores=1) == 1
        assert resolve_num_workers(None, cores=2) == 2
        assert resolve_num_workers(None, cores=64) == 4
        # explicit values pass through untouched
        assert resolve_num_workers(7, cores=2) == 7
