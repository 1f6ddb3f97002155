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

import logging
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


def _trial_index(
    xvectors: Dict[str, np.ndarray], trials: Sequence[Tuple[int, str, str]]
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(matrix (U, D), i1 (N,), i2 (N,)) for the utterances trials touch --
    one Python pass; everything downstream is vectorized gathers."""
    utts = sorted({u for _, a, b in trials for u in (a, b)})
    idx = {u: i for i, u in enumerate(utts)}
    mat = np.stack([xvectors[u] for u in utts]).astype(np.float32)
    i1 = np.fromiter((idx[a] for _, a, _ in trials), np.int64, len(trials))
    i2 = np.fromiter((idx[b] for _, _, b in trials), np.int64, len(trials))
    return mat, i1, i2


def cosine_scores(
    xvectors: Dict[str, np.ndarray], trials: Sequence[Tuple[int, str, str]]
) -> np.ndarray:
    """Dot products of (pre-normalized) trial vectors (snorm.py:113-120).
    A direct per-trial dot beats building index arrays here (measured: the
    unique-utterance set construction costs more than 550k small dots)."""
    return np.array(
        [float(np.dot(xvectors[u1], xvectors[u2])) for _, u1, u2 in trials],
        dtype=np.float64,
    )


_DEVICE_STATS_CACHE: Dict[int, object] = {}


def _device_topk_stats(topk: int):
    """Jitted (trial_block, cohort) -> (mean, std) of top-k cohort scores.
    Cached per topk: a fresh closure per cohort_stats call would defeat
    jax.jit's cache and recompile every invocation."""
    if topk not in _DEVICE_STATS_CACHE:
        import jax
        import jax.numpy as jnp

        @jax.jit
        def _stats(t, c):
            scores = jnp.dot(t, c.T, precision=jax.lax.Precision.HIGHEST)
            top, _ = jax.lax.top_k(scores, topk)
            return jnp.mean(top, axis=1), jnp.std(top, axis=1)

        _DEVICE_STATS_CACHE[topk] = _stats
    return _DEVICE_STATS_CACHE[topk]


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
    # A cohort smaller than topk means "use the whole cohort" (the reference
    # hits the same case through numpy's clamping [:, :topk] slice); the
    # device top_k would raise on k > rows.
    topk = min(topk, len(cohort_matrix))
    if use_device:
        try:
            import jax
            import jax.numpy as jnp
        except ImportError as e:
            # no-JAX install: the numpy path is the supported fallback
            logging.getLogger(__name__).warning(
                "cohort_stats: JAX unavailable (%s); using numpy", e)
        else:
            # NO blanket fallback past this point: a device/compile failure
            # here would silently hand VoxCeleb-scale asnorm to numpy
            # (slower, and masking genuine numeric drift) -- fail loudly.
            _stats = _device_topk_stats(topk)
            c = jnp.asarray(cohort_matrix, jnp.float32)
            n = len(trial_matrix)
            means, stds = [], []
            for lo in range(0, n, block_rows):
                # fixed block shape: ONE compile regardless of n or the
                # tail remainder (pad rows are discarded below)
                block = np.zeros((block_rows, trial_matrix.shape[1]),
                                 np.float32)
                rows = trial_matrix[lo: lo + block_rows]
                block[: len(rows)] = rows
                m, s = _stats(jnp.asarray(block), c)
                means.append(np.asarray(m[: len(rows)], np.float64))
                stds.append(np.asarray(s[: len(rows)], np.float64))
            return np.concatenate(means), np.concatenate(stds)
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
    trial_matrix, i1, i2 = _trial_index(xvectors, trials)
    cohort_matrix = np.stack(list(cohort.values())).astype(np.float32)
    mean, std = cohort_stats(trial_matrix, cohort_matrix, topk=topk)
    sc = np.asarray(raw_scores, np.float64)
    return 0.5 * ((sc - mean[i1]) / std[i1] + (sc - mean[i2]) / std[i2])


def write_scores(path: str, trials, scores) -> None:
    with open(path, "w") as f:
        for (_, u1, u2), sc in zip(trials, scores):
            print(u1, u2, sc, file=f)
