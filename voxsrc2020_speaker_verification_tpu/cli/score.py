"""Trial scoring CLI: cosine / adaptive s-norm + EER/minDCF.

Replaces the reference's snorm.py + eer_minDCF.py invocations
(/root/reference/eval_inference_model.sh:42-60):

    python -m voxsrc2020_speaker_verification_tpu.cli.score \
        --trials data/trials/list_T --xvectors data/voxceleb1/xvector.scp \
        --cohort-xvectors data/voxceleb2_dev/xvector.scp \
        --cohort-spk2utt data/voxceleb2_dev/spk2utt \
        --out scores_T.txt

Cohort options (ref snorm.py:45-81): per-speaker means of the cohort
dataset's embeddings (--cohort-xvectors + --cohort-spk2utt), or the exported
projection rows (--cohort-weights projection_weight.pkl).  Omit both for
plain cosine scoring.
"""

from __future__ import annotations

import argparse
import pickle

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__,
                                formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("--trials", required=True)
    p.add_argument("--xvectors", required=True, help="test xvector scp")
    p.add_argument("--cohort-xvectors", default=None)
    p.add_argument("--cohort-spk2utt", default=None)
    p.add_argument("--cohort-weights", default=None,
                   help="projection_weight.pkl (classifier rows as cohort)")
    p.add_argument("--topk", type=int, default=400)
    p.add_argument("--p-target", type=float, default=0.01)
    p.add_argument("--out", default=None, help="write '<utt1> <utt2> <score>' lines")
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)

    from ..data import kaldi_io
    from ..eval.metrics import evaluate_trials
    from ..eval.scoring import (
        asnorm_scores, cosine_scores, l2norm, read_trials, speaker_means,
        write_scores,
    )
    from ..utils import datadir

    trials = read_trials(args.trials)
    xvec = {
        utt: l2norm(vec)  # ref snorm.py:28-33: normalize on read
        for utt, vec in kaldi_io.read_vec_flt_scp(args.xvectors)
    }
    scores = cosine_scores(xvec, trials)
    mode = "cosine"

    cohort = None
    if args.cohort_weights:
        with open(args.cohort_weights, "rb") as f:
            w = pickle.load(f)
        cohort = {i: row for i, row in enumerate(np.asarray(w, np.float32))}
    elif args.cohort_xvectors:
        assert args.cohort_spk2utt, "--cohort-spk2utt required with --cohort-xvectors"
        raw = dict(kaldi_io.read_vec_flt_scp(args.cohort_xvectors))
        spk2utt = datadir.read_spk2utt(args.cohort_spk2utt)
        cohort = speaker_means(raw, spk2utt)

    if cohort is not None:
        scores = asnorm_scores(xvec, cohort, trials, scores, topk=args.topk)
        mode = f"asnorm-top{args.topk}"

    if args.out:
        write_scores(args.out, trials, scores)

    labels = np.array([t[0] for t in trials])
    if (labels >= 0).all():
        eer_pct, min_dcf = evaluate_trials(trials, scores, p_target=args.p_target)
        print(f"{mode}: EER {eer_pct:.4f}%  minDCF(p={args.p_target}) {min_dcf:.4f}")
    else:
        print(f"{mode}: scored {len(trials)} trials (no labels)")


if __name__ == "__main__":
    main()
