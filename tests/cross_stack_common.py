"""Shared machinery for the cross-stack SYSTEM equivalence tests.

One synthetic multi-speaker corpus in reference format (CM ark + utt2id.pkl)
is trained through BOTH complete stacks -- the reference's (tf_data ->
tf_train_tdnn.py trainer graph -> export/restore -> tf_extract chunking ->
snorm.py -> eer_minDCF.py, run by tests/ref_system_oracle.py) and this
framework's (tf_import init -> the production fit() loop -> make_embed_fn +
bucketed masked extraction -> eval/scoring + eval/metrics) -- and the two
are compared on the END TASK (EER/minDCF).  Used by
tests/test_cross_stack_system.py (TDNN family, round 4) and
tests/test_cross_stack_res2net.py (deep 2-D Res2Net, round 5).
"""

import functools
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
from voxsrc2020_speaker_verification_tpu.ops.cmvn import sliding_cmvn
from voxsrc2020_speaker_verification_tpu.ops.fbank import FbankConfig, fbank
from voxsrc2020_speaker_verification_tpu.training import (
    create_train_state, make_embed_fn,
)
from voxsrc2020_speaker_verification_tpu.training.checkpoint import (
    CheckpointManager,
)
from voxsrc2020_speaker_verification_tpu.training.loop import fit
from voxsrc2020_speaker_verification_tpu.training.trainer import TrainState
from voxsrc2020_speaker_verification_tpu.utils import tf_import

REFERENCE = "/root/reference/tensorflow"
ORACLE = os.path.join(os.path.dirname(__file__), "ref_system_oracle.py")
SR = 16000

# 6 distinct durations -> 6 fbank/cmvn compiles, utterances 1.2-2.0 s
DURATIONS = (1.2, 1.35, 1.5, 1.65, 1.8, 2.0)


def make_utterance(rng, spk, seconds, n_spk):
    """Synthetic speaker identity = two characteristic tones (shared grid,
    per-speaker pair; tones overlap between speakers), AMPLITUDE-MODULATED
    at a random 2-5 Hz, + noise.  The modulation is load-bearing: sliding
    CMVN subtracts the per-frequency mean over a 300-frame window, so a
    STATIONARY tone is nulled to noise (measured: within-speaker mean-
    feature cosine ~0, nothing learns); AM keeps the tone signature in the
    post-CMVN dynamics, like real speech.  Utterance-level phase/amplitude/
    frequency jitter keeps within-speaker variation real."""
    t = np.arange(int(seconds * SR)) / SR
    grid = np.linspace(250, 6200, n_spk)
    f0 = grid[spk] * (1 + 0.003 * rng.randn())
    f1 = grid[(spk * 7 + 3) % n_spk] * (1 + 0.003 * rng.randn())

    def am():
        return 0.55 + 0.45 * np.sin(
            2 * np.pi * (2 + 3 * rng.rand()) * t + rng.rand() * 6.28)

    sig = (3000 * (1 + 0.2 * rng.rand()) * am()
           * np.sin(2 * np.pi * f0 * t + rng.rand() * 6.28)
           + 2000 * (1 + 0.2 * rng.rand()) * am()
           * np.sin(2 * np.pi * f1 * t + rng.rand() * 6.28)
           + 700 * rng.randn(len(t)))
    return np.clip(sig, -32768, 32767).astype(np.float32)


def build_corpus(work, sys_cfg, corpus_seed=42):
    """Reference-format corpus: CM arks with sliding-CMVN'd FBANK features
    (both stacks read the same bytes), utt2id.pkl, scps, trials.
    Returns the trial list [(label, utt_a, utt_b), ...]."""
    n_spk = sys_cfg["num_classes"]
    train_per_spk = sys_cfg["dataset_length"] // n_spk
    test_per_spk = sys_cfg["test_per_spk"]
    feat_dim = sys_cfg["feat_dim"]

    rng = np.random.RandomState(corpus_seed)
    fb = FbankConfig(num_bins=feat_dim, dither=0.0)

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
        for spk in range(n_spk):
            spk_utts = []
            for i in range(train_per_spk):
                sec = DURATIONS[rng.randint(len(DURATIONS))]
                key = f"s{spk:02d}-u{i:02d}"
                w.write(key, features(make_utterance(rng, spk, sec, n_spk)))
                utt2id[key] = spk
                spk_utts.append(key)
            spk2utt[f"s{spk:02d}"] = spk_utts

    test_keys = []
    with kaldi_io.ArkScpWriter(str(work / "test.ark"),
                               str(work / "test.scp"), compress=True) as w:
        for spk in range(n_spk):
            for i in range(test_per_spk):
                sec = DURATIONS[rng.randint(len(DURATIONS))]
                key = f"s{spk:02d}-t{i:02d}"
                w.write(key, features(make_utterance(rng, spk, sec, n_spk)))
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
        json.dump(sys_cfg, f)
    return trials


def run_oracle(work):
    """Run the reference system end-to-end (subprocess); returns the npz."""
    pytest.importorskip("tensorflow")
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


def reference_stream(work, sys_cfg, n_micro):
    """Regenerate the exact microbatch stream the oracle consumed by running
    the reference's own DataGenerator (pure numpy) with the same seed."""
    batch = sys_cfg["batch"]
    feat_dim, feat_length = sys_cfg["feat_dim"], sys_cfg["feat_length"]
    sys.path.insert(0, REFERENCE)
    try:
        tf_data = importlib.import_module("tf_data")
        np.random.seed(sys_cfg["data_seed"])
        dg = iter(tf_data.DataGenerator(
            str(work / "train.ark"), "ark:{0}", str(work / "utt2id.pkl"),
            "None", "None", sys_cfg["num_classes"], feat_dim, feat_length,
            None, None, training=True, specaug=False))
        feats = np.empty((n_micro, batch, feat_length, feat_dim), np.float32)
        labels = np.empty((n_micro, batch), np.int32)
        for k in range(n_micro):
            for b in range(batch):
                feats[k, b], labels[k, b] = next(dg)
        return feats, labels
    finally:
        sys.path.remove(REFERENCE)


def run_framework_system(cfg, work, trials, oracle, tmp_path, topk):
    """The framework side of the comparison, end to end: verify the data
    stream bit-matches the oracle's, import the oracle's init, run the
    production fit() loop over the identical stream, extract with the
    bucketed masked pipeline, score (cosine + asnorm), and return a summary
    dict -- the caller asserts its own pre-registered tolerances."""
    assert cfg.epoch_size == int(oracle["__epoch_size__"])
    n_steps = cfg.total_steps
    accum = cfg.num_accumulation_steps
    n_micro = n_steps * accum

    # --- identical data order, verified bit-exactly --------------------
    sys_cfg = json.load(open(work / "config.json"))
    feats, labels = reference_stream(work, sys_cfg, n_micro)
    want_crc = oracle["__stream_crc__"]
    for k in range(n_micro):
        assert zlib.crc32(feats[k].tobytes()) == want_crc[k], (
            f"data stream diverged from the reference feeder at "
            f"microbatch {k}")

    # --- identical init via tf_import ----------------------------------
    snap = {k[len("init/"):]: oracle[k] for k in oracle.files
            if k.startswith("init/")}
    params, batch_stats = tf_import.import_reference_weights(
        snap, cfg.model, projection_id=cfg.projection)
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
            yield (feats[k * accum:(k + 1) * accum],
                   labels[k * accum:(k + 1) * accum])

    from voxsrc2020_speaker_verification_tpu.parallel.sharding import make_mesh
    mesh = make_mesh(num_data=1, num_model=1, devices=jax.devices()[:1])
    result = fit(cfg, stream(), resume_from=str(init_dir), log_every=1,
                 log_fn=lambda s: None, mesh=mesh, checkpoint=True)
    assert result.steps_run == n_steps
    state = result.state

    # --- per-epoch CE trajectories -------------------------------------
    ref_log = oracle["__log__"]  # per microbatch: gs ce reg acc lr margin
    ref_ce = ref_log[:, 1].reshape(n_steps, accum).mean(axis=1)
    ours = [json.loads(l) for l in open(
        os.path.join(cfg.exp_dir, "metrics.jsonl"))]
    our_ce = np.array([m["classification_loss"] for m in ours])
    assert len(our_ce) == n_steps
    es = cfg.epoch_size
    ref_epoch = ref_ce.reshape(cfg.total_epochs, es).mean(axis=1)
    our_epoch = our_ce.reshape(cfg.total_epochs, es).mean(axis=1)

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
    asn = asnorm_scores(xvec, cohort, trials, cos, topk=topk)
    our_cosine = evaluate_trials(trials, cos)
    our_asnorm = evaluate_trials(trials, asn)

    summary = {
        "model": cfg.model,
        "ref_cosine": [float(x) for x in oracle["ref_cosine"]],
        "our_cosine": list(map(float, our_cosine)),
        "ref_asnorm": [float(x) for x in oracle["ref_asnorm"]],
        "our_asnorm": list(map(float, our_asnorm)),
        "final_acc": float(np.mean([m["accuracy"] for m in ours[-es:]])),
        "final_epoch_ce": [float(our_epoch[-1]), float(ref_epoch[-1])],
        "max_epoch_ce_absdiff": float(np.max(np.abs(our_epoch - ref_epoch))),
    }
    return summary, our_epoch, ref_epoch


def emit_summary(summary, env_key, tag):
    """Print the summary and write it to $<env_key> (a json path) if set --
    scripts/cross_stack_report.py uses this to build the per-round
    cross_stack_r*.json artifact."""
    print(f"\n{tag} " + json.dumps(summary))
    out = os.environ.get(env_key)
    if out:
        with open(out, "w") as f:
            json.dump(summary, f, indent=2)
