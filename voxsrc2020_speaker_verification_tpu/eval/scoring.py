"""Trial scoring: cosine similarity + adaptive symmetric s-norm.

Reference semantics (/root/reference/tensorflow/snorm.py):

* all test vectors l2-normalized on read (snorm.py:28-33)
* speaker (cohort) embeddings: per-speaker mean of l2-normalized utterance
  vectors, NOT re-normalized after the mean (snorm.py:45-67)
* cosine score = plain dot of the two (normalized) trial vectors (:113-120)
* adaptive s-norm: per-trial-side z-norm against the top-400 scores vs the
  cohort, symmetric 0.5*(z1+z2) (:83-131); cohort = 5994 voxceleb2_dev
  speaker means, or the exported projection rows

TPU-first: the cohort scoring is a single (num_trial_vecs, D) x (D, cohort)
matmul + top_k on device -- replacing the reference's blocked numpy matmul
(snorm.py:99-109) -- then tiny per-trial arithmetic on host.
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Sequence, Tuple

import numpy as np


def l2norm(x: np.ndarray, axis: int = -1) -> np.ndarray:
    return x / np.linalg.norm(x, axis=axis, keepdims=True)


def speaker_means(
    xvectors: Dict[str, np.ndarray], spk2utt: Dict[str, List[str]]
) -> Dict[str, np.ndarray]:
    """Per-speaker mean of l2-normalized utterance vectors (snorm.py:45-67).
    Input vectors may be raw; they are normalized here.  The mean itself is
    deliberately NOT re-normalized (reference behavior)."""
    out = {}
    for spk, utts in spk2utt.items():
        vecs = [xvectors[u] for u in utts if u in xvectors]
        if vecs:
            out[spk] = l2norm(np.stack(vecs), axis=1).mean(axis=0)
    return out


def read_trials(path: str) -> List[Tuple[int, str, str]]:
    """Trial file lines: '<label> <utt1> <utt2>' (label optional for scoring)."""
    trials = []
    with open(path) as f:
        for line in f:
            parts = line.strip().split()
            if len(parts) == 3:
                trials.append((int(parts[0]), parts[1], parts[2]))
            elif len(parts) == 2:
                trials.append((-1, parts[0], parts[1]))
    return trials


def cosine_scores(
    xvectors: Dict[str, np.ndarray], trials: Sequence[Tuple[int, str, str]]
) -> np.ndarray:
    """Dot products of (pre-normalized) trial vectors (snorm.py:113-120)."""
    return np.array(
        [float(np.dot(xvectors[u1], xvectors[u2])) for _, u1, u2 in trials],
        dtype=np.float64,
    )


def cohort_stats(
    trial_matrix: np.ndarray,
    cohort_matrix: np.ndarray,
    topk: int = 400,
    use_device: bool = True,
    block_rows: int = 8192,
) -> Tuple[np.ndarray, np.ndarray]:
    """Per-trial-vector mean/std of its top-k cohort scores (snorm.py:83-110).

    trial_matrix (N, D) and cohort_matrix (C, D) should already carry the
    normalization the reference applies (trial vecs l2-normed; cohort =
    speaker means of l2-normed vecs).  The trial side is processed in
    `block_rows` chunks (the reference blocks at 1024, snorm.py:99-109) so
    the (N, C) score matrix is never materialized -- at VoxCeleb scale that
    would be tens of GB.
    """
    if use_device:
        try:
            import jax
            import jax.numpy as jnp

            @jax.jit
            def _stats(t, c):
                scores = jnp.dot(t, c.T, precision=jax.lax.Precision.HIGHEST)
                top, _ = jax.lax.top_k(scores, topk)
                return jnp.mean(top, axis=1), jnp.std(top, axis=1)

            c = jnp.asarray(cohort_matrix, jnp.float32)
            n = len(trial_matrix)
            means, stds = [], []
            for lo in range(0, n, block_rows):
                block = np.zeros((min(block_rows, n), trial_matrix.shape[1]),
                                 np.float32)
                rows = trial_matrix[lo: lo + block_rows]
                block[: len(rows)] = rows
                m, s = _stats(jnp.asarray(block), c)
                means.append(np.asarray(m[: len(rows)], np.float64))
                stds.append(np.asarray(s[: len(rows)], np.float64))
            return np.concatenate(means), np.concatenate(stds)
        except Exception:
            pass
    means, stds = [], []
    for lo in range(0, len(trial_matrix), block_rows):
        scores = trial_matrix[lo: lo + block_rows] @ cohort_matrix.T
        top = -np.sort(-scores, axis=1)[:, :topk]
        means.append(top.mean(axis=1))
        stds.append(top.std(axis=1))
    return np.concatenate(means), np.concatenate(stds)


def asnorm_scores(
    xvectors: Dict[str, np.ndarray],
    cohort: Dict[str, np.ndarray],
    trials: Sequence[Tuple[int, str, str]],
    raw_scores: np.ndarray,
    topk: int = 400,
) -> np.ndarray:
    """Adaptive symmetric s-norm of precomputed cosine scores
    (snorm.py:123-131): 0.5 * ((s - m1)/sd1 + (s - m2)/sd2)."""
    utts = sorted({u for _, a, b in trials for u in (a, b)})
    trial_matrix = np.stack([xvectors[u] for u in utts]).astype(np.float32)
    cohort_matrix = np.stack(list(cohort.values())).astype(np.float32)
    mean, std = cohort_stats(trial_matrix, cohort_matrix, topk=topk)
    m = dict(zip(utts, mean))
    s = dict(zip(utts, std))
    out = np.empty(len(trials), np.float64)
    for i, (_, u1, u2) in enumerate(trials):
        sc = raw_scores[i]
        out[i] = 0.5 * ((sc - m[u1]) / s[u1] + (sc - m[u2]) / s[u2])
    return out


def write_scores(path: str, trials, scores) -> None:
    with open(path, "w") as f:
        for (_, u1, u2), sc in zip(trials, scores):
            print(u1, u2, sc, file=f)
