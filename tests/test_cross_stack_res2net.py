"""Cross-stack SYSTEM equivalence for a deep 2-D Res2Net.

Round 4 proved end-task equivalence (train -> export -> extract -> score ->
EER/minDCF) for the TDNN family; this is the same two-complete-systems
comparison for the layers a thin TDNN never exercises: stride-2 split
convolutions with the avg-pool passthrough (ref res2net_model.py:26-78,
batched into ONE grouped conv on our side, models/res2net.py), projection
shortcuts, and masked pooling over 8x-downsampled time -- through a full
multi-epoch schedule with BN-statistics interactions.

Both stacks train a thin instance of the SAME architecture (the reference
Model class is parameterized for this, res2net_model.py:139-167; ours via
register_res2net_variant) on one 64-speaker corpus: identical init
(tf_import of the oracle's initializer draw), bit-identical data streams
(CRC per microbatch), each stack's own complete train/export/extract/score
pipeline.  16 epochs cross warmup (epoch 3), the margin ramp (3..13) and
the first LR-decay step (13) of the reference schedule
(tf_train_tdnn.py:198-201); the full 23-epoch staircase is covered by the
TDNN variant in test_cross_stack_system.py.

Pre-registered tolerances: same class as the TDNN proof (PERF.md
"Cross-stack end-task equivalence") -- chance EER is 50%, a broken layer
shows up as tens of percent; the tolerance admits only the residue of
full-LR chaos.
"""

import os

import numpy as np
import pytest

import cross_stack_common as cs

from voxsrc2020_speaker_verification_tpu.models import register_res2net_variant
from voxsrc2020_speaker_verification_tpu.training import TrainConfig

pytestmark = pytest.mark.skipif(
    not os.path.isdir(cs.REFERENCE), reason="reference repo not mounted")

N_SPK = 64
TRAIN_PER_SPK = 12
TEST_PER_SPK = 4
FEAT_DIM = 40
FEAT_LENGTH = 48
BATCH, ACCUM = 16, 2
TOTAL_EPOCHS = 16   # crosses warmup, margin ramp, first decay step
TOPK = 32
DATA_SEED = 1234

# Thin Res2Net: 5 bottleneck blocks over 4 stages -- stage 1 keeps a
# stride-1 block pair (hierarchical adds + identity passthrough + one
# non-projection block), stages 2-4 are stride-2 (batched grouped conv +
# avg-pool passthrough + projection shortcut); 48 frames downsample to 6.
SYS_CFG = dict(
    family="res2net",
    feat_dim=FEAT_DIM, feat_length=FEAT_LENGTH, batch=BATCH, accum=ACCUM,
    num_classes=N_SPK, dataset_length=N_SPK * TRAIN_PER_SPK,
    total_epochs=TOTAL_EPOCHS, scale=32.0, margin=0.2, topk=TOPK,
    num_filters=[8, 16, 32, 64], width=[4, 8, 16, 32], split=4,
    block_sizes=[2, 1, 1, 1], block_strides=[1, 2, 2, 2], output_dim=64,
    data_seed=DATA_SEED, test_per_spk=TEST_PER_SPK,
)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    work = tmp_path_factory.mktemp("cross_stack_res2net")
    trials = cs.build_corpus(work, SYS_CFG)
    return work, trials


@pytest.fixture(scope="module")
def oracle(corpus):
    work, _ = corpus
    return cs.run_oracle(work)


def test_cross_stack_res2net_end_task_equivalence(corpus, oracle, tmp_path):
    work, trials = corpus
    cfg = TrainConfig(
        model=register_res2net_variant(
            "res2net_sys_eq",
            num_filters=tuple(SYS_CFG["num_filters"]),
            width=tuple(SYS_CFG["width"]), split=SYS_CFG["split"],
            block_sizes=tuple(SYS_CFG["block_sizes"]),
            block_strides=tuple(SYS_CFG["block_strides"]),
            output_dim=SYS_CFG["output_dim"]),
        projection="sc_cm_linear", num_classes=N_SPK, num_centers=2,
        scale=32.0, margin=0.2,
        dataset_length=N_SPK * TRAIN_PER_SPK, feat_dim=FEAT_DIM,
        feat_length=FEAT_LENGTH, batch_size=BATCH,
        num_accumulation_steps=ACCUM, total_epochs=TOTAL_EPOCHS,
        bf16=False, specaug=False, exp_root=str(tmp_path / "exp"), seed=0,
    )
    summary, our_epoch, ref_epoch = cs.run_framework_system(
        cfg, work, trials, oracle, tmp_path, topk=TOPK)

    # Pre-registered: same class as the TDNN proof; measured round-5
    # deviation recorded in PERF.md.  A broken block/BN/pool moves epoch
    # CE by O(1).
    np.testing.assert_allclose(our_epoch, ref_epoch, atol=0.35, rtol=0.12,
                               err_msg="per-epoch CE trajectory diverged")

    cs.emit_summary(summary, "CROSS_STACK_SUMMARY_RES2NET",
                    "CROSS_STACK_RES2NET_SUMMARY")

    for what in ("cosine", "asnorm"):
        our, ref = summary[f"our_{what}"], summary[f"ref_{what}"]
        assert abs(our[0] - ref[0]) <= 2.0, (
            f"{what} EER diverged: ours {our[0]:.3f}% vs ref {ref[0]:.3f}%")
        assert abs(our[1] - ref[1]) <= 0.08, (
            f"{what} minDCF diverged: ours {our[1]:.4f} vs ref {ref[1]:.4f}")
    # and the task was actually learned (not two equally-broken stacks)
    assert summary["our_asnorm"][0] < 20.0 and summary["ref_asnorm"][0] < 20.0
