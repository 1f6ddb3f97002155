"""Scoring wall-clock at VoxCeleb1-H scale on the real chip.

The reference scores trials with numpy on the host (snorm.py): cosine dots
per trial plus a blocked (N, 5994) cohort matmul + partial sort for
adaptive s-norm.  Here the cohort top-k runs on device
(eval/scoring.py:cohort_stats).  VoxCeleb1-H: ~550k trials over ~1190
utterances from 1251 speakers is the largest published set
(ref README.md trials lists); this uses its shape with synthetic vectors.

Usage: python scripts/bench_score.py [num_trials] [num_utts] [cohort]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

EMB = 256


def main():
    num_trials = int(sys.argv[1]) if len(sys.argv) > 1 else 550_000
    num_utts = int(sys.argv[2]) if len(sys.argv) > 2 else 1200
    cohort_n = int(sys.argv[3]) if len(sys.argv) > 3 else 5994

    from voxsrc2020_speaker_verification_tpu.eval.metrics import (
        evaluate_trials,
    )
    from voxsrc2020_speaker_verification_tpu.eval.scoring import (
        asnorm_scores, cosine_scores, l2norm,
    )

    rng = np.random.default_rng(0)
    utts = [f"u{i:05d}" for i in range(num_utts)]
    xv = {u: l2norm(rng.standard_normal(EMB).astype(np.float32))
          for u in utts}
    cohort = {f"spk{i}": l2norm(rng.standard_normal(EMB).astype(np.float32))
              for i in range(cohort_n)}
    a = rng.integers(0, num_utts, num_trials)
    b = rng.integers(0, num_utts, num_trials)
    trials = [(int(i % 2), utts[x], utts[y]) for i, (x, y) in
              enumerate(zip(a, b))]

    t0 = time.perf_counter()
    raw = cosine_scores(xv, trials)
    t_cos = time.perf_counter() - t0

    # warm the device compile outside the timed region
    asnorm_scores(xv, cohort, trials[:1000], raw[:1000])
    t0 = time.perf_counter()
    snorm = asnorm_scores(xv, cohort, trials, raw)
    t_as = time.perf_counter() - t0

    t0 = time.perf_counter()
    eer, dcf = evaluate_trials(trials, snorm)
    t_eer = time.perf_counter() - t0

    print(f"# {num_trials} trials, {num_utts} utts, cohort {cohort_n}")
    print(f"cosine={t_cos:.2f}s asnorm={t_as:.2f}s eer_mindcf={t_eer:.2f}s "
          f"total={t_cos + t_as + t_eer:.2f}s  # eer={eer:.2f}% (random)")


if __name__ == "__main__":
    main()
