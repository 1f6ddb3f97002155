"""LMFT end-to-end gate on real hardware: 64 synthetic speakers ->
PRETRAIN (f200, margin 0.2) -> LMFT RESUME (f600, margin 0.4, one extra
epoch in the x1/128 LR tail, through the restored-global-step schedule) ->
bucketed masked extraction -> cosine + adaptive s-norm -> EER/minDCF.

This proves the reference's LMFT resume trick END TO END on the chip: the
finetune recipe reuses the pretrain experiment dir so the restored step
lands past the last LR boundary (ref run_res2net_finetune_local_vox2_dev.sh
:39-77, tf_scheduler.py:72-73), while margin and crop length change.  The
whole production path runs: CM feature store -> C++ native feeder ->
fit() with orbax checkpoints -> resume -> extraction -> asnorm.

Usage: python scripts/e2e_lmft_demo.py [model] [num_speakers]
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

SR = 16000
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__))))
from e2e_demo import synth_utt  # per-speaker dynamics that survive CMVN


def main():
    model = sys.argv[1] if len(sys.argv) > 1 else "res2net50_w8_s6_c16"
    num_spk = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    train_per_spk, test_per_spk = 16, 4
    seconds = 7.5  # >600 frames for the LMFT crop

    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))

    from voxsrc2020_speaker_verification_tpu.data import kaldi_io, native
    from voxsrc2020_speaker_verification_tpu.data.dataset import (
        BatchFeeder, FeatureShardDataset,
    )
    from voxsrc2020_speaker_verification_tpu.eval.extract import extract_embeddings
    from voxsrc2020_speaker_verification_tpu.eval.metrics import evaluate_trials
    from voxsrc2020_speaker_verification_tpu.eval.scoring import (
        asnorm_scores, cosine_scores, l2norm, speaker_means,
    )
    from voxsrc2020_speaker_verification_tpu.ops.cmvn import sliding_cmvn
    from voxsrc2020_speaker_verification_tpu.ops.fbank import FbankConfig, fbank
    from voxsrc2020_speaker_verification_tpu.training import (
        TrainConfig, make_embed_fn,
    )
    from voxsrc2020_speaker_verification_tpu.training.loop import fit

    fb = FbankConfig(num_bins=80, dither=0.0)
    rng = np.random.RandomState(0)
    spks = [(120 + 700 * rng.rand(), 0.4 + 0.5 * rng.rand(),
             1.5 + 6.0 * rng.rand(), 0.02 + 0.08 * rng.rand(),
             1.0 + 7.0 * rng.rand()) for _ in range(num_spk)]

    work = tempfile.mkdtemp(prefix="e2e_lmft_")
    print(f"# synthesizing {num_spk} speakers x {train_per_spk} utts "
          f"({seconds}s) ...", file=sys.stderr)
    fbank_j = jax.jit(lambda w: fbank(w, fb))  # raw fbank: feeder applies CMN

    utt2id = {}
    scp = os.path.join(work, "feats.scp")
    with kaldi_io.ArkScpWriter(os.path.join(work, "feats.ark"), scp,
                               compress=True) as w:
        for s in range(num_spk):
            waves = np.stack(
                [synth_utt(rng, spks[s], seconds) for _ in range(train_per_spk)])
            for i, f in enumerate(np.asarray(fbank_j(waves))):
                key = f"s{s:02d}-u{i:02d}"
                w.write(key, f)
                utt2id[key] = s

    cmn = jax.jit(lambda f: sliding_cmvn(f, window=300))
    test_utts, cohort_feats = {}, {}
    for s in range(num_spk):
        waves = np.stack(
            [synth_utt(rng, spks[s], seconds) for _ in range(test_per_spk + 2)])
        feats = np.asarray(cmn(fbank_j(waves)))
        for i in range(test_per_spk):
            test_utts[f"s{s:02d}-t{i}"] = feats[i]
        for i in range(2):
            cohort_feats[f"s{s:02d}-c{i}"] = feats[test_per_spk + i]

    dataset_length = num_spk * train_per_spk

    def make_feeder(batch, accum, frames, seed):
        if native.available() and hasattr(native.get_lib(), "vox_feeder_create"):
            return native.NativeBatchFeeder(
                scp, utt2id, 80, frames, batch, accum, seed=seed).start()
        return BatchFeeder(
            [FeatureShardDataset(scp, utt2id, 80, frames, seed=seed)],
            batch, accum).start()

    exp_root = os.path.join(work, "exp")
    base = dict(
        model=model, projection="sc_cm_linear", num_classes=num_spk,
        num_centers=2, dataset_length=dataset_length, feat_dim=80,
        bf16=True, exp_root=exp_root, seed=0,
    )
    pre_cfg = TrainConfig(batch_size=64, num_accumulation_steps=1,
                          feat_length=200, margin=0.2, total_epochs=23,
                          **base)
    # NB: a 32-sample microbatch at f600 reproducibly CRASHES the v5e
    # worker (same shape class as the 32x32-remat sweep crashes, PERF.md);
    # 64x1 keeps the effective batch and avoids the faulting shape.
    lmft_cfg = TrainConfig(batch_size=64, num_accumulation_steps=1,
                           feat_length=600, margin=0.4, total_epochs=24,
                           **base)

    def run(cfg, resume_from=None, tag=""):
        feeder = make_feeder(cfg.batch_size, cfg.num_accumulation_steps,
                             cfg.feat_length, seed=1)
        try:
            t0 = time.perf_counter()
            result = fit(cfg, feeder, resume_from=resume_from, log_every=50,
                         log_fn=lambda s: print(f"# {tag} {s}", file=sys.stderr))
            return result, time.perf_counter() - t0
        finally:
            feeder.close() if hasattr(feeder, "close") else feeder.stop()

    print(f"# pretrain: {pre_cfg.total_steps} steps f200 margin 0.2",
          file=sys.stderr)
    pre_res, pre_s = run(pre_cfg, tag="pre")
    assert pre_res.steps_run == pre_cfg.total_steps

    def evaluate(state, cfg, buckets=(512, 800)):
        embed = jax.jit(make_embed_fn(cfg))
        def extract(utts):
            return extract_embeddings(
                lambda f, m: embed(state.params, state.batch_stats, f, m),
                iter(utts.items()), batch_size=16, buckets=buckets)
        xvec = {k: l2norm(np.asarray(v))
                for k, v in extract(test_utts).items()}
        utts = sorted(xvec)
        trials = [(int(a[:3] == b[:3]), a, b)
                  for i, a in enumerate(utts) for b in utts[i + 1:]]
        cos = cosine_scores(xvec, trials)
        spk2utt = {}
        for u in cohort_feats:
            spk2utt.setdefault(u[:3], []).append(u)
        cohort = speaker_means(extract(cohort_feats), spk2utt)
        asn = asnorm_scores(xvec, cohort, trials, cos,
                            topk=min(40, num_spk))
        return evaluate_trials(trials, cos), evaluate_trials(trials, asn)

    (pre_eer_c, pre_dcf_c), (pre_eer_a, pre_dcf_a) = evaluate(
        pre_res.state, pre_cfg)
    print(f"# pretrain: cosine {pre_eer_c:.2f}% asnorm {pre_eer_a:.2f}%",
          file=sys.stderr)

    # LMFT: resume from the pretrain experiment dir -- the restored global
    # step (23 epochs) lands past the last LR boundary, so the extra epoch
    # runs at LR/128 with margin 0.4 / frames 600 (the reference's resume
    # contract: schedules are keyed off the restored step).
    print(f"# LMFT: resume from {pre_cfg.exp_dir} -> "
          f"{lmft_cfg.total_steps - pre_cfg.total_steps} steps f600 "
          f"margin 0.4 @ LR/128", file=sys.stderr)
    lmft_res, lmft_s = run(lmft_cfg, resume_from=pre_cfg.exp_dir, tag="lmft")
    assert int(lmft_res.state.step) == lmft_cfg.total_steps

    (eer_c, dcf_c), (eer_a, dcf_a) = evaluate(lmft_res.state, lmft_cfg)

    print(json.dumps({
        "model": model, "speakers": num_spk,
        "pretrain_steps": pre_cfg.total_steps,
        "lmft_steps": lmft_res.steps_run,
        "pretrain": {"eer_cosine_pct": round(pre_eer_c, 3),
                     "eer_asnorm_pct": round(pre_eer_a, 3),
                     "min_dcf_asnorm": round(pre_dcf_a, 4),
                     "seconds": round(pre_s, 1)},
        "lmft": {"eer_cosine_pct": round(eer_c, 3),
                 "eer_asnorm_pct": round(eer_a, 3),
                 "min_dcf_asnorm": round(dcf_a, 4),
                 "seconds": round(lmft_s, 1)},
        "chance_eer_pct": 50.0,
    }))
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
