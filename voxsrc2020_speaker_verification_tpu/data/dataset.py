"""Host-side input pipeline.

Mirrors the reference's feeder semantics
(/root/reference/tensorflow/tf_data.py:22-125, tf_train_tdnn.py:30-64):

* infinite iteration over per-host scp shards with the 10%-random-skip
  reshuffle on every pass (tf_data.py:69)
* optional global CMVN from a (mean, std) pickle (tf_data.py:80-81)
* random crop to ``feat_length`` / random-shift zero-pad when short
  (tf_data.py:84-101)
* SpecAugment is NOT applied here -- it runs on device inside the jitted
  train step (ops/specaug.py), unlike the reference's host numpy version.

TPU-first differences: batches come out as (A, B, T, F) with the gradient
accumulation axis leading, ready for the scan inside one optimizer step, and
a raw-audio mode yields padded int16-scale waveforms for on-device
FBANK+CMVN (the north-star path).  Feeding uses a background thread pool
with a bounded queue (depth 2 per the reference, tf_train_tdnn.py:153).
"""

from __future__ import annotations

import pickle
import queue
import threading
from typing import Callable, Dict, Iterator, Optional, Sequence, Tuple

import numpy as np

from . import kaldi_io


def sliding_cmn_np(feat: np.ndarray, window: int = 300) -> np.ndarray:
    """Host-side sliding cepstral mean normalization, identical to
    ``apply-cmvn-sliding --norm-vars=false --center=true`` (the feature
    read-spec the reference trainer pipes every utterance through BEFORE
    cropping, ref tf_train_tdnn.py:83) and to ops.cmvn.sliding_cmvn
    (cross-checked in tests/test_data.py).  O(T) via one cumulative sum."""
    t, f = feat.shape
    csum = np.zeros((t + 1, f), np.float64)
    np.cumsum(feat, axis=0, out=csum[1:])
    ts = np.arange(t)
    start = np.clip(ts - window // 2, 0, max(0, t - window))
    end = np.minimum(start + window, t)
    mean = (csum[end] - csum[start]) / (end - start)[:, None]
    return (feat - mean).astype(np.float32)


class FeatureCropper:
    """Reference crop/pad policy (tf_data.py:84-101)."""

    def __init__(self, feat_length: int, feat_dim: int, rng: np.random.RandomState):
        self.feat_length = feat_length
        self.feat_dim = feat_dim
        self.rng = rng

    def __call__(self, feat: np.ndarray) -> np.ndarray:
        t = self.feat_length
        if feat.shape[0] < t:
            out = np.zeros((t, self.feat_dim), np.float32)
            shift = self.rng.randint(t - feat.shape[0] + 1)
            out[shift: shift + feat.shape[0]] = feat
            return out
        shift = self.rng.randint(feat.shape[0] - t + 1)
        return np.ascontiguousarray(feat[shift: shift + t], dtype=np.float32)


class FeatureShardDataset:
    """Infinite (feat, label) stream over one scp shard of precomputed
    features, with reference-compatible reshuffle/crop semantics."""

    def __init__(
        self,
        scp_path: str,
        utt2id: Dict[str, int],
        feat_dim: int,
        feat_length: int,
        cmvn_pkl: Optional[str] = None,
        training: bool = True,
        skip_percent: int = 10,
        transform: Optional[Callable[[np.ndarray], np.ndarray]] = None,
        seed: int = 0,
        sliding_cmn: bool = True,
        cmn_window: int = 300,
    ):
        self.sliding_cmn = sliding_cmn
        self.cmn_window = cmn_window
        self.scp_path = scp_path
        self.utt2id = utt2id
        self.feat_dim = feat_dim
        self.feat_length = feat_length
        self.training = training
        self.skip_percent = skip_percent
        self.transform = transform
        self.rng = np.random.RandomState(seed)
        self.mean, self.std = (None, None)
        if cmvn_pkl:
            with open(cmvn_pkl, "rb") as f:
                self.mean, self.std = pickle.load(f)
        self.cropper = FeatureCropper(feat_length, feat_dim, self.rng)

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.int32]]:
        gen = kaldi_io.read_mat_scp(self.scp_path)
        while True:
            try:
                utt, feat = next(gen)
                # per-epoch-restart reshuffle: randomly skip ~10% of utts
                # (ref tf_data.py:69)
                if self.training and self.rng.randint(0, 100) >= 100 - self.skip_percent:
                    continue
            except StopIteration:
                if not self.training:
                    return
                gen = kaldi_io.read_mat_scp(self.scp_path)
                utt, feat = next(gen)
            if self.sliding_cmn:
                # full-utterance window BEFORE cropping, like the reference's
                # apply-cmvn-sliding feeder pipe (tf_train_tdnn.py:83)
                feat = sliding_cmn_np(feat, self.cmn_window)
            if self.mean is not None:
                feat = (feat - self.mean) / self.std
            if self.transform is not None:
                feat = self.transform(feat)
            if self.training:
                feat = self.cropper(feat)
            label = np.int32(self.utt2id[utt]) if self.utt2id else utt
            yield feat, label


class SyntheticDataset:
    """Random batches for throughput benchmarking (ref
    tf_train_tdnn.py:59-64 get_batch_synthetic)."""

    def __init__(self, feat_dim: int, feat_length: int, num_classes: int, seed: int = 0):
        self.feat_dim = feat_dim
        self.feat_length = feat_length
        self.num_classes = num_classes
        self.rng = np.random.RandomState(seed)

    def __iter__(self):
        while True:
            yield (
                self.rng.rand(self.feat_length, self.feat_dim).astype(np.float32),
                np.int32(self.rng.randint(self.num_classes)),
            )


class BatchFeeder:
    """Background feeder: drains one or more sample iterators into a bounded
    queue of (A, B, T, F) / (A, B) numpy batches.

    The reference spawns `num_shards_per_rank` processes per rank pushing
    single microbatches (tf_train_tdnn.py:151-164); here each source gets a
    thread (IO-bound work releases the GIL in numpy/file reads) and whole
    optimizer-step batches are assembled so the device sees one transfer per
    step.
    """

    def __init__(
        self,
        sources: Sequence,
        batch_size: int,
        num_accumulation_steps: int = 1,
        queue_depth: int = 2,
        wire_bf16: bool = False,
    ):
        # bf16 wire format halves the host->device feature transfer.  With
        # bf16 compute (TrainConfig.bf16) it is lossless: the first conv
        # casts its input to bf16 anyway, so quantizing on the host moves
        # the cast across the wire instead of adding one.  (The raw-audio
        # path gets the same effect from int16 waveforms,
        # data/raw_dataset.py.)
        self.wire_dtype = None
        if wire_bf16:
            import ml_dtypes

            self.wire_dtype = np.dtype(ml_dtypes.bfloat16)
        self.sources = list(sources)
        self.batch_size = batch_size
        self.num_accum = num_accumulation_steps
        self.sample_queue: "queue.Queue" = queue.Queue(
            maxsize=max(2, queue_depth) * batch_size * num_accumulation_steps
        )
        self.batch_queue: "queue.Queue" = queue.Queue(maxsize=queue_depth)
        self._stop = threading.Event()
        self._threads = []

    def _pump_source(self, source):
        it = iter(source)
        while not self._stop.is_set():
            try:
                item = next(it)
            except StopIteration:
                break
            while not self._stop.is_set():
                try:
                    self.sample_queue.put(item, timeout=0.5)
                    break
                except queue.Full:
                    continue

    def _assemble(self):
        a, b = self.num_accum, self.batch_size
        while not self._stop.is_set():
            feats, labels = [], []
            while len(feats) < a * b and not self._stop.is_set():
                try:
                    f, l = self.sample_queue.get(timeout=0.5)
                except queue.Empty:
                    continue
                feats.append(f)
                labels.append(l)
            if self._stop.is_set():
                return
            if isinstance(feats[0], tuple):
                # raw-audio samples: tuple of per-field arrays/scalars
                fb = tuple(
                    np.stack([f[k] for f in feats]).reshape(
                        a, b, *np.shape(feats[0][k])
                    )
                    for k in range(len(feats[0]))
                )
            else:
                fb = np.stack(feats).reshape(a, b, *feats[0].shape)
                if self.wire_dtype is not None:
                    fb = fb.astype(self.wire_dtype)
            lb = np.asarray(labels, np.int32).reshape(a, b)
            while not self._stop.is_set():
                try:
                    self.batch_queue.put((fb, lb), timeout=0.5)
                    break
                except queue.Full:
                    continue

    def start(self) -> "BatchFeeder":
        for src in self.sources:
            t = threading.Thread(target=self._pump_source, args=(src,), daemon=True)
            t.start()
            self._threads.append(t)
        t = threading.Thread(target=self._assemble, daemon=True)
        t.start()
        self._threads.append(t)
        return self

    def __iter__(self):
        while True:
            yield self.batch_queue.get()

    def get(self, timeout: Optional[float] = None):
        return self.batch_queue.get(timeout=timeout)

    def stop(self):
        self._stop.set()


def shard_paths_for_host(
    data_dir: str, total_shards: int, host_index: int, num_hosts: int
) -> list:
    """Which `feats.{i}.scp` shards this host owns (ref
    tf_train_tdnn.py:159-160: contiguous block per rank)."""
    assert total_shards % num_hosts == 0
    per_host = total_shards // num_hosts
    return [
        f"{data_dir}/{total_shards}-split/feats.{i + 1}.scp"
        for i in range(per_host * host_index, per_host * (host_index + 1))
    ]
