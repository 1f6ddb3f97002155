"""Cross-stack SYSTEM equivalence: the reference stack and this framework
train on the same corpus and are compared on the END TASK (EER/minDCF).

This is the in-image proxy for the VoxCeleb reproduction that no-egress
blocks: one synthetic 64-speaker corpus in reference format (CM ark +
utt2id.pkl), the REFERENCE stack (tf_data.DataGenerator -> the
tf_train_tdnn.py:194-317 trainer graph -> export_inference_graph-style
restore -> tf_extract chunking -> snorm.py -> eer_minDCF.py, run by
tests/ref_system_oracle.py) vs THIS framework (identical init via
tf_import, identical data order, the production fit() loop with per-epoch
orbax checkpoints -> make_embed_fn + bucketed masked extraction ->
eval/scoring + eval/metrics), each through its own complete pipeline.
Shared machinery: tests/cross_stack_common.py; the deep 2-D variant lives
in tests/test_cross_stack_res2net.py.

Asserted (pre-registered tolerances, calibrated in round 4 -- see PERF.md
"Cross-stack end-task equivalence"):
  * the two stacks consume bit-identical data streams (CRC per microbatch),
  * per-epoch mean CE trajectories track (full multi-epoch schedule:
    warmup, margin ramp, exponential decay all crossed),
  * final EER/minDCF agree within tolerance on BOTH cosine and asnorm
    scoring -- machinery parity converted into system-level equivalence.

The model is a thin instance of the TDNN family (the reference Model class
is parameterized for exactly this, tdnn_model.py:112-124) so the TF-CPU
side stays in CPU minutes; the trainer/projection/schedule wiring is the
recipe one.
"""

import os

import numpy as np
import pytest

import cross_stack_common as cs

from voxsrc2020_speaker_verification_tpu.models import register_tdnn_variant
from voxsrc2020_speaker_verification_tpu.training import TrainConfig

pytestmark = pytest.mark.skipif(
    not os.path.isdir(cs.REFERENCE), reason="reference repo not mounted")

N_SPK = 64
TRAIN_PER_SPK = 12
TEST_PER_SPK = 4
FEAT_DIM = 40   # the reference's 40-d flavor (conf/fbank40.conf)
FEAT_LENGTH = 48
BATCH, ACCUM = 16, 2
TOTAL_EPOCHS = 23
TOPK = 32
DATA_SEED = 1234

SYS_CFG = dict(
    feat_dim=FEAT_DIM, feat_length=FEAT_LENGTH, batch=BATCH, accum=ACCUM,
    num_classes=N_SPK, dataset_length=N_SPK * TRAIN_PER_SPK,
    total_epochs=TOTAL_EPOCHS, scale=32.0, margin=0.2, topk=TOPK,
    block_filters=[64, 64, 64, 64, 192], output_dim=64,
    data_seed=DATA_SEED, test_per_spk=TEST_PER_SPK,
)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    work = tmp_path_factory.mktemp("cross_stack")
    trials = cs.build_corpus(work, SYS_CFG)
    return work, trials


@pytest.fixture(scope="module")
def oracle(corpus):
    work, _ = corpus
    return cs.run_oracle(work)


def test_cross_stack_end_task_equivalence(corpus, oracle, tmp_path):
    work, trials = corpus
    cfg = TrainConfig(
        model=register_tdnn_variant(
            "tdnn_sys_eq", block_filters=tuple(SYS_CFG["block_filters"]),
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

    # Pre-registered: measured round-4 deviation is <=0.19 abs over all 23
    # epochs (chaos-limited, not wiring-limited; both trajectories descend
    # together through warmup, margin ramp and the decay staircase); a
    # broken trainer moves epoch CE by O(1).
    np.testing.assert_allclose(our_epoch, ref_epoch, atol=0.35, rtol=0.12,
                               err_msg="per-epoch CE trajectory diverged")

    cs.emit_summary(summary, "CROSS_STACK_SUMMARY", "CROSS_STACK_SUMMARY")

    # --- pre-registered end-task tolerances ----------------------------
    # Chance EER is 50%; a broken layer anywhere shows up as tens of
    # percent.  Measured round-4 gap (PERF.md "Cross-stack end-task
    # equivalence"): cosine ref 6.33%/0.681 vs ours 7.10%/0.716; asnorm
    # ref 3.46%/0.569 vs ours 4.68%/0.572 -- i.e. <=1.3% EER abs and
    # <=0.04 minDCF, the residue of 552 chaotic full-LR steps, not wiring.
    for what in ("cosine", "asnorm"):
        our, ref = summary[f"our_{what}"], summary[f"ref_{what}"]
        assert abs(our[0] - ref[0]) <= 2.0, (
            f"{what} EER diverged: ours {our[0]:.3f}% vs ref {ref[0]:.3f}%")
        assert abs(our[1] - ref[1]) <= 0.08, (
            f"{what} minDCF diverged: ours {our[1]:.4f} vs ref {ref[1]:.4f}")
    # and the task was actually learned (not two equally-broken stacks)
    assert summary["our_asnorm"][0] < 20.0 and summary["ref_asnorm"][0] < 20.0
