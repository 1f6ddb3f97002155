"""End-to-end demo on real hardware: synthetic multi-speaker corpus ->
raw-audio training (on-device FBANK+CMVN) -> bucketed masked extraction ->
cosine + adaptive s-norm scoring -> EER/minDCF.

A scaled-up, on-TPU version of tests/test_e2e_learning.py (the reference's
only QA shape was exactly this end-to-end metric check, SURVEY.md §4).
Speakers are synthetic (per-speaker harmonic stacks + band noise), so the
EER target is "far below chance", not a VoxCeleb number -- the point is the
whole production path executing on the real chip.

Usage: python scripts/e2e_demo.py [model] [steps] [num_speakers]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

SR = 16000


def synth_utt(rng, spk, seconds=2.5):
    """Per-speaker *dynamics*, not just a static spectrum: sliding CMVN
    removes the windowed per-channel mean, so a stationary harmonic stack
    would be normalized away entirely.  Speaker identity here lives in the
    vibrato rate/depth, the AM rate, and the spectral tilt -- temporal
    patterns that survive mean removal, like real speech prosody."""
    f0, tilt, vib_rate, vib_depth, am_rate = spk
    n = int(seconds * SR)
    t = np.arange(n) / SR
    f0_t = f0 * (1.0 + 0.03 * rng.randn()) \
        * (1.0 + vib_depth * np.sin(2 * np.pi * vib_rate * t + rng.rand() * 6.28))
    phase = 2 * np.pi * np.cumsum(f0_t) / SR
    am = 0.6 + 0.4 * np.sin(2 * np.pi * am_rate * t + rng.rand() * 6.28)
    sig = np.zeros(n)
    for h in range(1, 5):
        sig += (tilt ** h) * np.sin(h * phase)
    sig *= am
    sig = 6000 * sig / np.abs(sig).max()
    sig += 200 * rng.randn(n)
    return np.clip(sig, -32768, 32767).astype(np.float32)


def main():
    model = sys.argv[1] if len(sys.argv) > 1 else "ecapa_tdnn_512"
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 120
    num_spk = int(sys.argv[3]) if len(sys.argv) > 3 else 16

    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))

    from voxsrc2020_speaker_verification_tpu.eval.extract import extract_embeddings
    from voxsrc2020_speaker_verification_tpu.eval.metrics import evaluate_trials
    from voxsrc2020_speaker_verification_tpu.eval.scoring import (
        asnorm_scores, cosine_scores, l2norm, speaker_means,
    )
    from voxsrc2020_speaker_verification_tpu.ops.cmvn import sliding_cmvn
    from voxsrc2020_speaker_verification_tpu.ops.fbank import FbankConfig, fbank
    from voxsrc2020_speaker_verification_tpu.training import (
        TrainConfig, create_train_state, make_train_step, make_embed_fn,
    )

    cfg = TrainConfig(
        model=model, projection="aam_linear", num_classes=num_spk,
        dataset_length=num_spk * 1024, feat_dim=80, feat_length=200,
        batch_size=64, num_accumulation_steps=1, total_epochs=23,
        bf16=True, base_lr=0.01, exp_root="")
    fb = FbankConfig(num_bins=80, dither=0.0)

    rng = np.random.RandomState(0)
    spks = [(120 + 700 * rng.rand(), 0.4 + 0.5 * rng.rand(),
             1.5 + 6.0 * rng.rand(), 0.02 + 0.08 * rng.rand(),
             1.0 + 7.0 * rng.rand()) for _ in range(num_spk)]

    print(f"# synthesizing {num_spk} speakers...", file=sys.stderr)
    featurize = jax.jit(lambda w: sliding_cmvn(fbank(w, fb), window=300))
    train_pool = []
    for s in range(num_spk):
        waves = np.stack([synth_utt(rng, spks[s]) for _ in range(8)])
        feats = np.asarray(featurize(waves))
        train_pool += [(s, f) for f in feats]
    test_utts = {}
    for s in range(num_spk):
        waves = np.stack([synth_utt(rng, spks[s]) for _ in range(4)])
        for i, f in enumerate(np.asarray(featurize(waves))):
            test_utts[f"s{s}-u{i}"] = f

    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(cfg), donate_argnums=0)
    crop = cfg.feat_length
    t0 = time.perf_counter()
    acc = 0.0
    for it in range(steps):
        idx = rng.choice(len(train_pool), cfg.batch_size)
        off = rng.randint(0, train_pool[0][1].shape[0] - crop + 1, cfg.batch_size)
        feats = np.stack([train_pool[i][1][o: o + crop]
                          for i, o in zip(idx, off)])[None]
        labels = np.array([[train_pool[i][0] for i in idx]], np.int32)
        state, metrics = step(state, feats.astype(np.float32), labels,
                              jax.random.PRNGKey(it))
        if (it + 1) % 20 == 0:
            acc = float(metrics["accuracy"])
            print(f"# step {it + 1}: loss {float(metrics['loss']):.3f} "
                  f"acc {acc:.3f}", file=sys.stderr)
    train_s = time.perf_counter() - t0

    embed = jax.jit(make_embed_fn(cfg))
    embeddings = extract_embeddings(
        lambda f, m: embed(state.params, state.batch_stats, f, m),
        iter(test_utts.items()), batch_size=16, buckets=(256,))
    xvec = {k: l2norm(np.asarray(v)) for k, v in embeddings.items()}
    utts = sorted(xvec)
    trials = [(int(a.split("-")[0] == b.split("-")[0]), a, b)
              for i, a in enumerate(utts) for b in utts[i + 1:]]
    cos = cosine_scores(xvec, trials)
    eer_cos, dcf_cos = evaluate_trials(trials, cos)

    # adaptive s-norm against a cohort of training-speaker means
    spk2utt = {f"c{s}": [f"c{s}-{j}" for j in range(8)] for s in range(num_spk)}
    cohort_in = {}
    for s in range(num_spk):
        for j in range(8):
            cohort_in[f"c{s}-{j}"] = np.asarray(
                embed(state.params, state.batch_stats,
                      train_pool[s * 8 + j][1][None, :256], None))[0]
    cohort = speaker_means(cohort_in, spk2utt)
    asn = asnorm_scores(xvec, cohort, trials, cos, topk=min(10, num_spk))
    eer_asn, dcf_asn = evaluate_trials(trials, asn)

    print(json.dumps({
        "model": model, "steps": steps, "speakers": num_spk,
        "train_accuracy": round(acc, 4), "train_seconds": round(train_s, 1),
        "eer_cosine_pct": round(eer_cos, 3), "min_dcf_cosine": round(dcf_cos, 4),
        "eer_asnorm_pct": round(eer_asn, 3), "min_dcf_asnorm": round(dcf_asn, 4),
        "chance_eer_pct": 50.0,
    }))


if __name__ == "__main__":
    main()
