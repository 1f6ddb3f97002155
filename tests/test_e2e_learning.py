"""End-to-end learnability smoke: synthetic separable speakers through the
full stack (waveform -> on-device FBANK+CMVN -> training -> extraction ->
cosine scoring -> EER).  The reference's only QA was exactly this shape of
end-to-end metric check (SURVEY.md §4); here it is a fast deterministic
version: EER on held-out utterances must beat chance by a wide margin."""

import dataclasses

import jax
import numpy as np

from voxsrc2020_speaker_verification_tpu.eval.extract import extract_embeddings
from voxsrc2020_speaker_verification_tpu.eval.metrics import evaluate_trials
from voxsrc2020_speaker_verification_tpu.eval.scoring import cosine_scores, l2norm
from voxsrc2020_speaker_verification_tpu.ops.cmvn import sliding_cmvn
from voxsrc2020_speaker_verification_tpu.ops.fbank import FbankConfig, fbank
from voxsrc2020_speaker_verification_tpu.training import (
    TrainConfig, create_train_state, make_train_step, make_embed_fn,
)

SR = 16000
CFG = TrainConfig(
    model="tdnn", projection="am_linear", num_classes=2,
    dataset_length=256, feat_dim=24, feat_length=32,
    batch_size=8, num_accumulation_steps=1, total_epochs=23,
    bf16=False, base_lr=0.05, exp_root="",
)
FB = FbankConfig(num_bins=24, dither=0.0)


def _utt(rng, spk):
    """0.4 s utterance; speakers differ in spectral band."""
    t = np.arange(int(0.4 * SR)) / SR
    f0 = 300 + 40 * rng.rand() if spk == 0 else 2500 + 300 * rng.rand()
    sig = 4000 * np.sin(2 * np.pi * f0 * t) + 300 * rng.randn(len(t))
    return np.clip(sig, -32768, 32767).astype(np.float32)


def _features(wave):
    f = np.asarray(fbank(wave[None], FB))[0]
    return np.asarray(sliding_cmvn(f[None], window=300))[0]


def test_train_then_eer_beats_chance():
    rng = np.random.RandomState(0)
    train_feats = [(s, _features(_utt(rng, s))) for s in [0, 1] * 12]
    test_utts = {f"s{s}-u{i}": _features(_utt(rng, s))
                 for s in (0, 1) for i in range(4)}

    state = create_train_state(CFG, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(CFG), donate_argnums=0)
    crop = CFG.feat_length
    for it in range(30):
        idx = rng.choice(len(train_feats), CFG.batch_size)
        feats = np.stack([
            train_feats[i][1][:crop] for i in idx
        ])[None]  # (A=1, B, T, F)
        labels = np.array([[train_feats[i][0] for i in idx]], np.int32)
        state, metrics = step(state, feats.astype(np.float32), labels,
                              jax.random.PRNGKey(1))
    assert float(metrics["accuracy"]) > 0.8, dict(metrics)

    embed = jax.jit(make_embed_fn(CFG))
    embeddings = extract_embeddings(
        lambda f, m: embed(state.params, state.batch_stats, f, m),
        iter(test_utts.items()), batch_size=4, buckets=(64,),
    )
    xvec = {k: l2norm(v) for k, v in embeddings.items()}
    utts = sorted(xvec)
    trials = [(int(a.split("-")[0] == b.split("-")[0]), a, b)
              for i, a in enumerate(utts) for b in utts[i + 1:]]
    eer, _ = evaluate_trials(trials, cosine_scores(xvec, trials))
    assert eer < 25.0, f"EER {eer}% on separable speakers"
