"""Embedding extraction: batched, bucketed, masked -- no dynamic shapes.

Chunking semantics are reference-exact (tf_extract.py:96-111):

    num_chunks = 1 + (T - 25) // 1000
    chunk i    = frames [i*1000, i*1000 + len_i), len_i = 1000 or the tail
    embedding  = sum_i emb_i * len_i / sum_i len_i

(a tail shorter than 25 frames is dropped; an utterance shorter than 25
frames would produce zero chunks in the reference -- we instead emit one
full-length chunk so nothing is silently lost).

TPU-first: the reference runs batch-1 with dynamic [None, None, F] shapes --
a recompile-per-length disaster on XLA.  Here every chunk is padded up to a
small set of static bucket lengths and batched; the models' masked pooling +
per-block time masking make the padded forward *equal* to the exact-length
forward (see ops.nn.mask_time, verified in tests/test_models.py), so parity
is preserved while the MXU sees large static batches.
"""

from __future__ import annotations

import bisect
from typing import Callable, Dict, Iterable, Iterator, List, Optional, Sequence, Tuple

import numpy as np

MAX_FRAMES = 1000  # ref tf_extract.py:96
MIN_FRAMES = 25    # ref tf_extract.py:101-102


def resolve_wire_dtype(wire: str):
    """Map a --wire flag value to the numpy dtype used for the host->device
    feature buffers (pack_chunk_batch).  Raises on unknown values so a typo
    can never silently fall back to the fp32 wire."""
    if wire == "float32":
        return None
    if wire == "bfloat16":
        import ml_dtypes

        return ml_dtypes.bfloat16
    raise ValueError(f"wire must be float32|bfloat16, got {wire!r}")


def default_batch_size(model_name: str) -> int:
    """Measured-best extraction bucket batch per model class on v5e
    (PERF.md "Embedding extraction"): at B=64 each 1000-frame call on the
    w24/att-class Res2Nets is dispatch/latency-bound -- B=128 is 2.4x
    faster device-side; the small w8/TDNN models see no such win and keep
    the lighter 64."""
    return 128 if ("w24" in model_name or "_att" in model_name) else 64


def chunk_spans(t: int, max_frames: int = MAX_FRAMES, min_frames: int = MIN_FRAMES):
    """[(start, length), ...] per the reference chunking rule."""
    if t < min_frames:
        return [(0, t)]
    num_chunks = 1 + (t - min_frames) // max_frames
    spans = []
    for i in range(num_chunks):
        start = i * max_frames
        length = max_frames if (i + 1) * max_frames <= t else t - start
        spans.append((start, length))
    return spans


def select_bucket(buckets: Sequence[int], length: int,
                  max_frames: int = MAX_FRAMES) -> int:
    """Smallest bucket holding a chunk of `length` frames (buckets sorted)."""
    return buckets[bisect.bisect_left(buckets, min(length, max_frames))]


def pack_chunk_batch(chunks, bucket: int, feat_dim: int, wire_dtype=None):
    """Zero-pad chunk rows into one (B, bucket, F) feats + (B, bucket) mask
    pair.  `chunks` iterates (length, (length, F) feats); shared by offline
    extraction and the serving batcher so the masked-padding parity rule
    lives in exactly one place.

    ``wire_dtype`` (e.g. ``ml_dtypes.bfloat16``) packs the feature buffer in
    that dtype, halving the host->device transfer; the embed fns upcast to
    fp32 on device (training/trainer.py:make_embed_fn, eval/export.py), so
    for a bf16-compute model the bf16 wire is BIT-IDENTICAL to sending fp32
    (the model's own entry cast rounds to bf16 either way); for an fp32
    model it quantizes the input features to 8 mantissa bits."""
    chunks = list(chunks)
    f = np.zeros((len(chunks), bucket, feat_dim), wire_dtype or np.float32)
    m = np.zeros((len(chunks), bucket), np.float32)
    for i, (length, feats) in enumerate(chunks):
        f[i, :length] = feats
        m[i, :length] = 1.0
    return f, m


def extract_embeddings(
    embed_fn: Callable,
    features: Iterable[Tuple[str, np.ndarray]],
    batch_size: int = 32,
    buckets: Sequence[int] = (256, 512, 1000),
    max_frames: int = MAX_FRAMES,
    min_frames: int = MIN_FRAMES,
    wire_dtype=None,
) -> Dict[str, np.ndarray]:
    """Extract one embedding per utterance.

    embed_fn(feats (B, T, F), mask (B, T)) -> (B, D); jitted per bucket shape
    only (len(buckets) compiles total).
    features: iterable of (utt, (T, F) CMVN'd features).
    wire_dtype: see pack_chunk_batch -- e.g. ml_dtypes.bfloat16 halves the
    host->device feature transfer (exact for bf16-compute models).
    """
    buckets = sorted(set(list(buckets) + [max_frames]))

    # per-bucket pending batch: list of (utt, length, padded_feats)
    pending: Dict[int, List[Tuple[str, int, np.ndarray]]] = {b: [] for b in buckets}
    acc: Dict[str, Tuple[np.ndarray, float]] = {}
    # one batch stays in flight (async dispatch): the device computes batch
    # k while the host assembles k+1 and accumulates k-1
    inflight: List[Tuple[object, List[Tuple[str, int, np.ndarray]]]] = []

    def drain(keep: int = 0):
        while len(inflight) > keep:
            emb, batch = inflight.pop(0)
            emb = np.asarray(emb)  # materialize (device sync point)
            for i, (utt, length, _) in enumerate(batch):
                s, w = acc.get(utt, (0.0, 0.0))
                acc[utt] = (s + emb[i] * length, w + length)

    def flush(bucket: int):
        batch = pending[bucket]
        if not batch:
            return
        f, m = pack_chunk_batch(
            ((length, feats) for _, length, feats in batch),
            bucket, batch[0][2].shape[1], wire_dtype)
        inflight.append((embed_fn(f, m), batch))
        pending[bucket] = []
        drain(1)

    for utt, feats in features:
        for start, length in chunk_spans(len(feats), max_frames, min_frames):
            bucket = select_bucket(buckets, length, max_frames)
            pending[bucket].append((utt, length, feats[start: start + length]))
            if len(pending[bucket]) >= batch_size:
                flush(bucket)
    for b in buckets:
        flush(b)
    drain()

    return {utt: (s / w).astype(np.float32) for utt, (s, w) in acc.items()}


def make_bucketed_embed_fn(embed_fn: Callable, batch_size: Optional[int] = None,
                           pad_batch: bool = True) -> Callable:
    """Wrap a jitted embed fn so partial batches are padded to the full batch
    size (one compile per (batch, bucket) pair instead of per remainder).
    Pass the intended `batch_size` explicitly; otherwise the first call's
    batch pins the pad target (wrong if the first flush is partial)."""

    cache = {"batch": batch_size} if batch_size else {}

    def wrapped(feats: np.ndarray, mask: np.ndarray):
        b = feats.shape[0]
        target = cache.setdefault("batch", b)
        if pad_batch and b < target:
            pad = target - b
            feats = np.concatenate([feats, np.zeros((pad,) + feats.shape[1:], feats.dtype)])
            # keep one valid frame in padded rows to avoid 0/0 in pooling
            mask_pad = np.zeros((pad, mask.shape[1]), mask.dtype)
            mask_pad[:, 0] = 1.0
            mask = np.concatenate([mask, mask_pad])
            return embed_fn(feats, mask)[:b]
        return embed_fn(feats, mask)

    return wrapped
