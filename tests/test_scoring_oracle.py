"""Scoring-layer parity against the reference snorm.py / eer_minDCF.py run
as in-process oracles (they are numpy/sklearn-only): cosine scores, speaker
means, adaptive s-norm, EER and minDCF must match on synthetic embeddings."""

import importlib.util
import os
import sys

import numpy as np
import pytest

from voxsrc2020_speaker_verification_tpu.eval import metrics, scoring

REF = "/root/reference/tensorflow"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference repo not mounted")


def _load(name):
    spec = importlib.util.spec_from_file_location(
        f"ref_{name}", os.path.join(REF, f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.path.insert(0, REF)  # snorm.py imports the reference kaldi_io
    try:
        spec.loader.exec_module(mod)
    finally:
        sys.path.remove(REF)
    return mod


@pytest.fixture(scope="module")
def data():
    rng = np.random.RandomState(0)
    dim = 32
    test_utts = [f"t{i}" for i in range(60)]
    xvec = {u: rng.randn(dim).astype(np.float32) for u in test_utts}
    cohort_spk2utt = {f"c{s}": [f"c{s}_u{k}" for k in range(3)] for s in range(20)}
    cohort_vecs = {
        u: rng.randn(dim).astype(np.float32)
        for utts in cohort_spk2utt.values() for u in utts
    }
    labels = rng.randint(0, 2, size=200)
    pairs = [
        (int(l), test_utts[rng.randint(60)], test_utts[rng.randint(60)])
        for l in labels
    ]
    return xvec, cohort_spk2utt, cohort_vecs, pairs


def test_scoring_matches_reference(data, tmp_path):
    ref = _load("snorm")
    ref_eer = _load("eer_minDCF")
    xvec, cohort_spk2utt, cohort_vecs, trials = data
    topk = 15

    # --- reference path ---------------------------------------------------
    r_test = {u: ref.l2norm(v, axis=0) for u, v in xvec.items()}
    r_cohort_in = {u: ref.l2norm(v, axis=0) for u, v in cohort_vecs.items()}
    r_cohort = ref.read_speaker_xvector(r_cohort_in, cohort_spk2utt)
    trial_file = tmp_path / "trials.txt"
    with open(trial_file, "w") as f:
        for l, u1, u2 in trials:
            print(l, u1, u2, file=f)
    r_cos = ref.get_cosine_score(r_test, str(trial_file))
    m, s = ref.get_cohort_mean_std(r_test, r_cohort, topk=topk)
    r_asnorm = ref.get_asnorm1_score(m, s, r_cos)
    r_scores = np.array([sc for _, _, sc in r_asnorm])
    r_out = ref_eer.compute_eer_and_min_dcf(
        [l for l, _, _ in trials], r_scores, 1, 1, 0.01)

    # --- our path ----------------------------------------------------------
    o_test = {u: scoring.l2norm(v) for u, v in xvec.items()}
    o_cohort = scoring.speaker_means(cohort_vecs, cohort_spk2utt)
    o_cos = scoring.cosine_scores(o_test, trials)
    np.testing.assert_allclose(
        o_cos, np.array([sc for _, _, sc in r_cos]), rtol=1e-6, atol=1e-7)

    # cohort speaker means identical
    for spk, vec in r_cohort.items():
        np.testing.assert_allclose(o_cohort[spk], vec, rtol=1e-6, atol=1e-7)

    o_asnorm = scoring.asnorm_scores(o_test, o_cohort, trials, o_cos, topk=topk)
    np.testing.assert_allclose(o_asnorm, r_scores, rtol=1e-5, atol=1e-6)

    o_out = metrics.compute_eer_and_min_dcf(
        [l for l, _, _ in trials], o_asnorm, 1, 1, 0.01)
    # (thresholds differ at ~1e-8: our cohort stats run in fp32 on device,
    # the reference in fp64 numpy)
    np.testing.assert_allclose(o_out, r_out, rtol=1e-6)


def test_metrics_match_reference_on_raw_scores(data):
    ref_eer = _load("eer_minDCF")
    rng = np.random.RandomState(3)
    labels = rng.randint(0, 2, 500)
    scores_ = rng.randn(500) + labels * 1.5
    for p in (0.01, 0.05):
        r = ref_eer.compute_eer_and_min_dcf(labels, scores_, 1, 1, p)
        o = metrics.compute_eer_and_min_dcf(labels, scores_, 1, 1, p)
        np.testing.assert_allclose(o, r, rtol=1e-10)
