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

import importlib
import json
import os
import pickle
import subprocess
import sys
import zlib

import numpy as np
import pytest

import jax

from voxsrc2020_speaker_verification_tpu.data import kaldi_io
from voxsrc2020_speaker_verification_tpu.eval.extract import extract_embeddings
from voxsrc2020_speaker_verification_tpu.eval.metrics import evaluate_trials
from voxsrc2020_speaker_verification_tpu.eval.scoring import (
    asnorm_scores, cosine_scores, l2norm, speaker_means,
)
from voxsrc2020_speaker_verification_tpu.models import register_tdnn_variant
from voxsrc2020_speaker_verification_tpu.ops.cmvn import sliding_cmvn
from voxsrc2020_speaker_verification_tpu.ops.fbank import FbankConfig, fbank
from voxsrc2020_speaker_verification_tpu.training import (
    TrainConfig, create_train_state, make_embed_fn,
)
from voxsrc2020_speaker_verification_tpu.training.checkpoint import (
    CheckpointManager,
)
from voxsrc2020_speaker_verification_tpu.training.loop import fit
from voxsrc2020_speaker_verification_tpu.training.trainer import TrainState
from voxsrc2020_speaker_verification_tpu.utils import tf_import

REFERENCE = "/root/reference/tensorflow"
ORACLE = os.path.join(os.path.dirname(__file__), "ref_system_oracle.py")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference repo not mounted")

SR = 16000
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
    data_seed=DATA_SEED,
)

# 6 distinct durations -> 6 fbank/cmvn compiles, utterances 1.2-2.0 s
DURATIONS = (1.2, 1.35, 1.5, 1.65, 1.8, 2.0)


def _utterance(rng, spk, seconds):
    """Synthetic speaker identity = two characteristic tones (shared grid,
    per-speaker pair; tones overlap between speakers), AMPLITUDE-MODULATED
    at a random 2-5 Hz, + noise.  The modulation is load-bearing: sliding
    CMVN subtracts the per-frequency mean over a 300-frame window, so a
    STATIONARY tone is nulled to noise (measured: within-speaker mean-
    feature cosine ~0, nothing learns); AM keeps the tone signature in the
    post-CMVN dynamics, like real speech.  Utterance-level phase/amplitude/
    frequency jitter keeps within-speaker variation real."""
    t = np.arange(int(seconds * SR)) / SR
    grid = np.linspace(250, 6200, N_SPK)
    f0 = grid[spk] * (1 + 0.003 * rng.randn())
    f1 = grid[(spk * 7 + 3) % N_SPK] * (1 + 0.003 * rng.randn())

    def am():
        return 0.55 + 0.45 * np.sin(
            2 * np.pi * (2 + 3 * rng.rand()) * t + rng.rand() * 6.28)

    sig = (3000 * (1 + 0.2 * rng.rand()) * am()
           * np.sin(2 * np.pi * f0 * t + rng.rand() * 6.28)
           + 2000 * (1 + 0.2 * rng.rand()) * am()
           * np.sin(2 * np.pi * f1 * t + rng.rand() * 6.28)
           + 700 * rng.randn(len(t)))
    return np.clip(sig, -32768, 32767).astype(np.float32)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    """Reference-format corpus: CM arks with sliding-CMVN'd FBANK features
    (both stacks read the same bytes), utt2id.pkl, scps, trials."""
    work = tmp_path_factory.mktemp("cross_stack")
    rng = np.random.RandomState(42)
    fb = FbankConfig(num_bins=FEAT_DIM, dither=0.0)

    import functools

    @functools.lru_cache(maxsize=None)
    def _pipeline(nsamp):
        def run(wave):
            f = fbank(wave[None], fb)
            return sliding_cmvn(f, window=300)[0]
        return jax.jit(run)

    def features(wave):
        return np.asarray(_pipeline(len(wave))(wave))

    utt2id, spk2utt = {}, {}
    with kaldi_io.ArkScpWriter(str(work / "train.ark"),
                               str(work / "train.scp"), compress=True) as w:
        for spk in range(N_SPK):
            spk_utts = []
            for i in range(TRAIN_PER_SPK):
                sec = DURATIONS[rng.randint(len(DURATIONS))]
                key = f"s{spk:02d}-u{i:02d}"
                w.write(key, features(_utterance(rng, spk, sec)))
                utt2id[key] = spk
                spk_utts.append(key)
            spk2utt[f"s{spk:02d}"] = spk_utts

    test_keys = []
    with kaldi_io.ArkScpWriter(str(work / "test.ark"),
                               str(work / "test.scp"), compress=True) as w:
        for spk in range(N_SPK):
            for i in range(TEST_PER_SPK):
                sec = DURATIONS[rng.randint(len(DURATIONS))]
                key = f"s{spk:02d}-t{i:02d}"
                w.write(key, features(_utterance(rng, spk, sec)))
                test_keys.append(key)

    with open(work / "utt2id.pkl", "wb") as f:
        pickle.dump(utt2id, f)
    with open(work / "spk2utt.json", "w") as f:
        json.dump(spk2utt, f)
    # cohort = the training corpus, like voxceleb2_dev in
    # eval_inference_model.sh:27-40
    os.symlink(work / "train.scp", work / "cohort.scp")

    trials = [(int(a[:3] == b[:3]), a, b)
              for i, a in enumerate(test_keys) for b in test_keys[i + 1:]]
    with open(work / "trials.txt", "w") as f:
        for l, a, b in trials:
            print(l, a, b, file=f)
    with open(work / "config.json", "w") as f:
        json.dump(SYS_CFG, f)
    return work, trials


@pytest.fixture(scope="module")
def oracle(corpus):
    pytest.importorskip("tensorflow")
    work, _ = corpus
    out = work / "ref_system.npz"
    env = dict(os.environ, TF_USE_LEGACY_KERAS="1",
               CUDA_VISIBLE_DEVICES="", JAX_PLATFORMS="cpu")
    res = subprocess.run(
        [sys.executable, ORACLE, str(work), str(out)],
        capture_output=True, text=True, env=env, timeout=3600,
    )
    if res.returncode != 0:
        # TF imported fine, so a crash here is a real regression (ours or the
        # oracle env's) -- fail loudly instead of silently dropping the
        # system-level parity gate from the suite (ADVICE r4).
        pytest.fail(f"reference system oracle crashed (rc={res.returncode}): "
                    f"{res.stderr[-1200:]}")
    return np.load(out)


def _reference_stream(work, n_micro):
    """Regenerate the exact microbatch stream the oracle consumed by running
    the reference's own DataGenerator (pure numpy) with the same seed."""
    sys.path.insert(0, REFERENCE)
    try:
        tf_data = importlib.import_module("tf_data")
        np.random.seed(DATA_SEED)
        dg = iter(tf_data.DataGenerator(
            str(work / "train.ark"), "ark:{0}", str(work / "utt2id.pkl"),
            "None", "None", N_SPK, FEAT_DIM, FEAT_LENGTH, None, None,
            training=True, specaug=False))
        feats = np.empty((n_micro, BATCH, FEAT_LENGTH, FEAT_DIM), np.float32)
        labels = np.empty((n_micro, BATCH), np.int32)
        for k in range(n_micro):
            for b in range(BATCH):
                feats[k, b], labels[k, b] = next(dg)
        return feats, labels
    finally:
        sys.path.remove(REFERENCE)


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
    assert cfg.epoch_size == int(oracle["__epoch_size__"])
    n_steps = cfg.total_steps
    n_micro = n_steps * ACCUM

    # --- identical data order, verified bit-exactly --------------------
    feats, labels = _reference_stream(work, n_micro)
    want_crc = oracle["__stream_crc__"]
    for k in range(n_micro):
        assert zlib.crc32(feats[k].tobytes()) == want_crc[k], (
            f"data stream diverged from the reference feeder at "
            f"microbatch {k}")

    # --- identical init via tf_import ----------------------------------
    snap = {k[len("init/"):]: oracle[k] for k in oracle.files
            if k.startswith("init/")}
    params, batch_stats = tf_import.import_reference_weights(
        snap, "tdnn_sys_eq", projection_id="sc_cm_linear")
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    state = TrainState(
        step=state.step,
        params=jax.tree.map(np.asarray, params),
        batch_stats=jax.tree.map(np.asarray, batch_stats),
        momentum=jax.tree.map(lambda p: np.zeros(np.shape(p), np.float32),
                              params),
    )
    init_dir = tmp_path / "init_ckpt"
    mgr = CheckpointManager(str(init_dir))
    mgr.save(state, step=0)
    mgr.close()

    # --- the production fit() loop over the recorded stream ------------
    def stream():
        for k in range(n_steps):
            yield (feats[k * ACCUM:(k + 1) * ACCUM],
                   labels[k * ACCUM:(k + 1) * ACCUM])

    from voxsrc2020_speaker_verification_tpu.parallel.sharding import make_mesh
    mesh = make_mesh(num_data=1, num_model=1, devices=jax.devices()[:1])
    result = fit(cfg, stream(), resume_from=str(init_dir), log_every=1,
                 log_fn=lambda s: None, mesh=mesh, checkpoint=True)
    assert result.steps_run == n_steps
    state = result.state

    # --- per-epoch CE trajectories track the reference -----------------
    ref_log = oracle["__log__"]  # per microbatch: gs ce reg acc lr margin
    ref_ce = ref_log[:, 1].reshape(n_steps, ACCUM).mean(axis=1)
    ours = [json.loads(l) for l in open(
        os.path.join(cfg.exp_dir, "metrics.jsonl"))]
    our_ce = np.array([m["classification_loss"] for m in ours])
    assert len(our_ce) == n_steps
    es = cfg.epoch_size
    ref_epoch = ref_ce.reshape(TOTAL_EPOCHS, es).mean(axis=1)
    our_epoch = our_ce.reshape(TOTAL_EPOCHS, es).mean(axis=1)
    # Pre-registered: measured round-4 deviation is <=0.19 abs over all 23
    # epochs (chaos-limited, not wiring-limited; both trajectories descend
    # together through warmup, margin ramp and the decay staircase); a
    # broken trainer moves epoch CE by O(1).
    np.testing.assert_allclose(our_epoch, ref_epoch, atol=0.35, rtol=0.12,
                               err_msg="per-epoch CE trajectory diverged")

    # --- our full eval pipeline: bucketed masked extraction ------------
    embed = jax.jit(make_embed_fn(cfg))

    def extract(scp):
        return extract_embeddings(
            lambda f, m: embed(state.params, state.batch_stats, f, m),
            kaldi_io.read_mat_scp(str(scp)), batch_size=16,
            buckets=(128, 200))

    test_vec = extract(work / "test.scp")
    cohort_vec = extract(work / "cohort.scp")

    spk2utt = json.load(open(work / "spk2utt.json"))
    xvec = {k: l2norm(v) for k, v in test_vec.items()}
    cohort = speaker_means(cohort_vec, spk2utt)
    cos = cosine_scores(xvec, trials)
    asn = asnorm_scores(xvec, cohort, trials, cos, topk=TOPK)
    our_cosine = evaluate_trials(trials, cos)
    our_asnorm = evaluate_trials(trials, asn)

    ref_cosine = tuple(oracle["ref_cosine"])  # (eer %, minDCF)
    ref_asnorm = tuple(oracle["ref_asnorm"])

    summary = {
        "ref_cosine": list(map(float, ref_cosine)),
        "our_cosine": list(map(float, our_cosine)),
        "ref_asnorm": list(map(float, ref_asnorm)),
        "our_asnorm": list(map(float, our_asnorm)),
        "final_acc": float(np.mean([m["accuracy"] for m in ours[-es:]])),
        "final_epoch_ce": [float(our_epoch[-1]), float(ref_epoch[-1])],
        "max_epoch_ce_absdiff": float(np.max(np.abs(our_epoch - ref_epoch))),
    }
    print("\nCROSS_STACK_SUMMARY " + json.dumps(summary))
    out = os.environ.get("CROSS_STACK_SUMMARY")
    if out:
        with open(out, "w") as f:
            json.dump(summary, f, indent=2)

    # --- pre-registered end-task tolerances ----------------------------
    # Chance EER is 50%; a broken layer anywhere shows up as tens of
    # percent.  Measured round-4 gap (PERF.md "Cross-stack end-task
    # equivalence"): cosine ref 6.33%/0.681 vs ours 7.10%/0.716; asnorm
    # ref 3.46%/0.569 vs ours 4.68%/0.572 -- i.e. <=1.3% EER abs and
    # <=0.04 minDCF, the residue of 552 chaotic full-LR steps, not wiring.
    for (our, ref, what) in [(our_cosine, ref_cosine, "cosine"),
                             (our_asnorm, ref_asnorm, "asnorm")]:
        assert abs(our[0] - ref[0]) <= 2.0, (
            f"{what} EER diverged: ours {our[0]:.3f}% vs ref {ref[0]:.3f}%")
        assert abs(our[1] - ref[1]) <= 0.08, (
            f"{what} minDCF diverged: ours {our[1]:.4f} vs ref {ref[1]:.4f}")
    # and the task was actually learned (not two equally-broken stacks)
    assert our_asnorm[0] < 20.0 and ref_asnorm[0] < 20.0
