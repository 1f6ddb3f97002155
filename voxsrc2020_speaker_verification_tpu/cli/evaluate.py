"""One-shot evaluation: extract test + cohort embeddings, score every trial
list, print EER/minDCF.

Replaces the reference's eval_inference_model.sh (:27-60) orchestration
(per-GPU extraction shards + snorm.py + eer_minDCF.py per trial set).

Two equivalent surfaces:

    # from an experiment dir (exports an inference artifact if needed):
    python -m voxsrc2020_speaker_verification_tpu.cli.evaluate \
        --exp-dir exp/voxceleb2_dev_aug/res2net50_w24_s4_c32_... \
        --data-root data --trials T E H --asnorm

    # from an existing artifact with explicit paths:
    python -m voxsrc2020_speaker_verification_tpu.cli.evaluate \
        --artifact exp/.../artifact \
        --test-dir data/voxceleb1 --cohort-dir data/voxceleb2_dev \
        --trials T=data/voxceleb1_trials/list_test_T.txt \
                 E=data/voxceleb1_trials/list_test_E.txt \
                 H=data/voxceleb1_trials/list_test_H.txt

Bare trial names T/E/H resolve to ``<data-root>/voxceleb1_trials/
list_test_<NAME>.txt`` (the filenames cli.prepare_data downloads them to,
ref prepare_data.sh:205-210).  --asnorm scores adaptive s-norm against the
``<data-root>/voxceleb2_dev`` cohort (ref eval_inference_model.sh:42-50).
For the VoxSRC2022-dev protocol pass the trial list explicitly and
``--p-target 0.05`` (the reference reports minDCF0.05 there, README.md:278).

Prints cosine (and asnorm) EER/minDCF per trial set, the reference's README
table format.  Omit --cohort-dir/--asnorm for cosine-only, or pass
--cohort-weights to use the exported classifier rows as the cohort.
"""

from __future__ import annotations

import argparse
import os


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__,
                                formatter_class=argparse.RawDescriptionHelpFormatter)
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--artifact", default=None,
                     help="inference artifact dir (cli.export output)")
    src.add_argument("--exp-dir", default=None,
                     help="experiment dir; uses <exp-dir>/artifact, "
                          "exporting it from the latest checkpoint if absent")
    p.add_argument("--data-root", default="data",
                   help="data root for bare --trials names, the default "
                        "--test-dir and the --asnorm cohort")
    p.add_argument("--test-dir", default=None,
                   help="test data dir (default <data-root>/voxceleb1)")
    p.add_argument("--asnorm", action="store_true",
                   help="also score adaptive s-norm against the "
                        "<data-root>/voxceleb2_dev speaker-mean cohort")
    p.add_argument("--cohort-dir", default=None)
    p.add_argument("--cohort-weights", default=None)
    p.add_argument("--trials", nargs="+", required=True,
                   help="NAME=path entries, or bare T/E/H names resolved "
                        "under <data-root>/voxceleb1_trials/")
    p.add_argument("--batch-size", type=int, default=None,
                   help="extraction bucket batch (default: measured-best "
                        "per model class, eval/extract.py)")
    p.add_argument("--topk", type=int, default=400)
    p.add_argument("--p-target", type=float, default=0.01,
                   help="minDCF operating point (0.01 for VoxCeleb1 T/E/H, "
                        "0.05 for VoxSRC2022-dev, ref README.md:278)")
    p.add_argument("--out-dir", default=None,
                   help="where to write xvectors/scores (default: data dirs)")
    p.add_argument("--num-devices", type=int, default=0,
                   help="devices to fan extraction over (0 = all local)")
    p.add_argument("--wire", choices=("float32", "bfloat16"),
                   default="float32",
                   help="host->device feature wire for extraction "
                        "(cli.extract --wire)")
    p.add_argument("--cmvn", choices=("device", "host"), default="host",
                   help="where extraction's sliding CMVN runs "
                        "(cli.extract --cmvn; host = 4.0x measured "
                        "pipeline throughput, PERF.md)")
    return p


def resolve_artifact(args) -> str:
    """--artifact as given; --exp-dir uses/creates <exp-dir>/artifact."""
    if args.artifact:
        return args.artifact
    artifact = os.path.join(args.exp_dir, "artifact")
    if not os.path.exists(os.path.join(artifact, "config.json")):
        from .export import main as export_main
        print(f"exporting {artifact} from the latest checkpoint ...")
        export_main(["--exp-dir", args.exp_dir, "--out", artifact])
    return artifact


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)

    import pickle

    import numpy as np

    from ..data import kaldi_io
    from ..eval.metrics import evaluate_trials
    from ..eval.scoring import (
        asnorm_scores, cosine_scores, l2norm, read_trials, speaker_means,
    )
    from ..utils import datadir
    from .extract import extract_dataset

    artifact = resolve_artifact(args)
    test_dir = args.test_dir or os.path.join(args.data_root, "voxceleb1")
    cohort_dir = args.cohort_dir
    if args.asnorm and not cohort_dir and not args.cohort_weights:
        cohort_dir = os.path.join(args.data_root, "voxceleb2_dev")

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
            scp = extract_dataset(artifact, data_dir, prefix,
                                  batch_size=args.batch_size,
                                  num_devices=args.num_devices,
                                  wire=args.wire, cmvn=args.cmvn)
        return scp

    xvec = {u: l2norm(v) for u, v in
            kaldi_io.read_vec_flt_scp(xvector_scp(test_dir))}

    cohort = None
    if args.cohort_weights:
        with open(args.cohort_weights, "rb") as f:
            w = np.asarray(pickle.load(f), np.float32)
        cohort = {i: row for i, row in enumerate(w)}
    elif cohort_dir:
        raw = dict(kaldi_io.read_vec_flt_scp(xvector_scp(cohort_dir)))
        spk2utt = datadir.read_spk2utt(os.path.join(cohort_dir, "spk2utt"))
        cohort = speaker_means(raw, spk2utt)

    for entry in args.trials:
        name, _, path = entry.partition("=")
        if not path:
            if os.path.exists(name):  # bare path
                path = name
            else:
                # bare trial-set name -> where cli.prepare_data downloads it
                # (ref prepare_data.sh:207-210: data/<ds>_trials/list_test_X.txt)
                path = os.path.join(args.data_root, "voxceleb1_trials",
                                    f"list_test_{name}.txt")
        trials = read_trials(path)
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
