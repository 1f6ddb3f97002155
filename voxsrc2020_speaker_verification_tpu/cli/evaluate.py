"""One-shot evaluation: extract test + cohort embeddings, score every trial
list, print EER/minDCF.

Replaces the reference's eval_inference_model.sh (:27-60) orchestration
(per-GPU extraction shards + snorm.py + eer_minDCF.py per trial set):

    python -m voxsrc2020_speaker_verification_tpu.cli.evaluate \
        --artifact exp/.../artifact \
        --test-dir data/voxceleb1 --cohort-dir data/voxceleb2_dev \
        --trials T=data/trials/list_test_all_cleaned.txt \
                 E=data/trials/list_test_all2_cleaned.txt \
                 H=data/trials/list_test_hard2_cleaned.txt

Prints cosine and asnorm EER/minDCF per trial set (the reference's README
table format).  Omit --cohort-dir to score cosine-only, or pass
--cohort-weights to use the exported classifier rows as the cohort.
"""

from __future__ import annotations

import argparse
import os


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__,
                                formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("--artifact", required=True)
    p.add_argument("--test-dir", required=True)
    p.add_argument("--cohort-dir", default=None)
    p.add_argument("--cohort-weights", default=None)
    p.add_argument("--trials", nargs="+", required=True,
                   help="NAME=path entries")
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--topk", type=int, default=400)
    p.add_argument("--p-target", type=float, default=0.01)
    p.add_argument("--out-dir", default=None,
                   help="where to write xvectors/scores (default: data dirs)")
    p.add_argument("--num-devices", type=int, default=0,
                   help="devices to fan extraction over (0 = all local)")
    args = p.parse_args(argv)

    import pickle

    import numpy as np

    from ..data import kaldi_io
    from ..eval.metrics import evaluate_trials
    from ..eval.scoring import (
        asnorm_scores, cosine_scores, l2norm, read_trials, speaker_means,
    )
    from ..utils import datadir
    from .extract import extract_dataset

    def xvector_scp(data_dir):
        """Per-dataset xvector prefix: inside the data dir, or -- with
        --out-dir -- namespaced by the data dir's basename so the test and
        cohort sets never collide."""
        if args.out_dir:
            base = os.path.basename(os.path.normpath(data_dir))
            prefix = os.path.join(args.out_dir, f"xvector_{base}")
        else:
            prefix = os.path.join(data_dir, "xvector")
        scp = prefix + ".scp"
        if not os.path.exists(scp):
            print(f"extracting {data_dir} ...")
            os.makedirs(os.path.dirname(prefix), exist_ok=True)
            scp = extract_dataset(args.artifact, data_dir, prefix,
                                  batch_size=args.batch_size,
                                  num_devices=args.num_devices)
        return scp

    xvec = {u: l2norm(v) for u, v in
            kaldi_io.read_vec_flt_scp(xvector_scp(args.test_dir))}

    cohort = None
    if args.cohort_weights:
        with open(args.cohort_weights, "rb") as f:
            w = np.asarray(pickle.load(f), np.float32)
        cohort = {i: row for i, row in enumerate(w)}
    elif args.cohort_dir:
        raw = dict(kaldi_io.read_vec_flt_scp(xvector_scp(args.cohort_dir)))
        spk2utt = datadir.read_spk2utt(os.path.join(args.cohort_dir, "spk2utt"))
        cohort = speaker_means(raw, spk2utt)

    for entry in args.trials:
        name, _, path = entry.partition("=")
        trials = read_trials(path or name)
        scores = cosine_scores(xvec, trials)
        eer, dcf = evaluate_trials(trials, scores, p_target=args.p_target)
        line = f"[{name}] cosine: EER {eer:.4f}% minDCF {dcf:.4f}"
        if cohort is not None:
            s2 = asnorm_scores(xvec, cohort, trials, scores, topk=args.topk)
            eer2, dcf2 = evaluate_trials(trials, s2, p_target=args.p_target)
            line += f" | asnorm: EER {eer2:.4f}% minDCF {dcf2:.4f}"
        print(line)


if __name__ == "__main__":
    main()
