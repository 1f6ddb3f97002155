"""EER and minDCF, bit-compatible with the reference
(/root/reference/tensorflow/eer_minDCF.py:43-64):

* ROC from sklearn.roc_curve (same drop_intermediate behavior)
* EER = FPR at argmin |FNR - FPR|
* minDCF: linear scan of c_miss*FNR*p + c_fa*FPR*(1-p) over the ROC
  thresholds, normalized by min(c_miss*p, c_fa*(1-p)); defaults
  p_target=0.01, c_miss=c_fa=1.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np
from sklearn.metrics import roc_curve


def compute_eer_and_min_dcf(
    labels: Sequence[int],
    scores: Sequence[float],
    c_miss: float = 1.0,
    c_fa: float = 1.0,
    p_target: float = 0.01,
) -> Tuple[float, float, float, float]:
    """Returns (eer, eer_threshold, min_dcf, min_dcf_threshold)."""
    fprs, tprs, thresholds = roc_curve(labels, scores, pos_label=1)
    fnrs = 1.0 - tprs

    idx = int(np.nanargmin(np.abs(fnrs - fprs)))
    eer = float(fprs[idx])
    eer_threshold = float(thresholds[idx])

    c_det = c_miss * fnrs * p_target + c_fa * fprs * (1.0 - p_target)
    j = int(np.argmin(c_det))
    c_def = min(c_miss * p_target, c_fa * (1.0 - p_target))
    return eer, eer_threshold, float(c_det[j] / c_def), float(thresholds[j])


def evaluate_trials(trials, scores, p_target: float = 0.01):
    """(eer%, minDCF) from (label, utt1, utt2) trials + scores."""
    labels = [t[0] for t in trials]
    eer, _, min_dcf, _ = compute_eer_and_min_dcf(labels, scores, p_target=p_target)
    return eer * 100.0, min_dcf
