"""FBANK feature extraction pipeline: data dir in, Kaldi ark/scp out.

Replaces the reference's `compute-fbank-feats | copy-feats --compress`
nproc-parallel stage (/root/reference/prepare_data.sh:66-71,161-166) with a
device-batched JAX pipeline:

* waveforms (plain wavs or JSON augmentation specs, see data/augment.py) are
  loaded by a host thread pool,
* bucketed by length to a small set of static shapes and batched,
* log-mel FBANK computed on the accelerator (ops/fbank.py -- Kaldi-exact
  numerics; dither optional), one compile per bucket,
* written as Kaldi ark/scp (optionally CM-compressed like the reference's
  copy-feats --compress) so either stack can consume the result.

Throughput note: the FFT-as-matmul analysis (ops/fbank.py) makes the whole
feature pipeline three matmuls -> MXU-bound, far from the reference's
CPU-bound Kaldi stage.
"""

from __future__ import annotations

import concurrent.futures as cf
import os
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import numpy as np

from ..ops.fbank import FbankConfig, fbank_i16, num_frames, pcm16
from ..utils import datadir
from . import kaldi_io
from .augment import load_utterance


DEFAULT_BUCKETS_S = (2, 4, 6, 8, 12, 16, 24, 32, 48, 64, 96, 128)


def _bucket_for(n_samples: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if n_samples <= b:
            return b
    return buckets[-1]


def compute_features_for_dir(
    data_dir: str,
    feat_dim: int = 80,
    *,
    out_name: Optional[str] = None,
    compress: bool = True,
    batch_size: int = 16,
    bucket_seconds: Sequence[int] = DEFAULT_BUCKETS_S,
    sample_rate: int = 16000,
    dither_seed: Optional[int] = None,
    io_threads: int = 8,
    progress_every: int = 0,
) -> str:
    """Compute fbank{feat_dim}.ark/.scp (+ utt2num_frames) for a data dir.

    Returns the scp path.  Utterances longer than the largest bucket are
    truncated to it (128 s covers every VoxCeleb utterance).
    """
    import jax

    cfg = FbankConfig(num_bins=feat_dim, dither=1.0 if dither_seed is not None else 0.0)
    out_name = out_name or f"fbank{feat_dim}"
    wav = datadir.read_two_column(os.path.join(data_dir, "wav.scp"))
    keys = sorted(wav)

    buckets = [s * sample_rate for s in bucket_seconds]
    # int16 wire (ops.fbank.fbank_i16): halves the host->device transfer
    jit_fbank = jax.jit(fbank_i16, static_argnames=("cfg",))
    key = jax.random.PRNGKey(dither_seed) if dither_seed is not None else None

    ark = os.path.join(data_dir, out_name + ".ark")
    scp = os.path.join(data_dir, out_name + ".scp")
    utt2num: Dict[str, str] = {}

    # per-bucket pending [(utt, n_samples, wave)]
    pending: Dict[int, List[Tuple[str, int, np.ndarray]]] = {b: [] for b in buckets}
    writer = kaldi_io.ArkScpWriter(ark, scp, compress=compress)
    done = 0

    def flush(bucket: int):
        nonlocal key, done
        batch = pending[bucket]
        if not batch:
            return
        # pad partial batches (tail of the corpus) up to batch_size: one
        # XLA compile per bucket instead of one per distinct batch length.
        # Rows are independent and the counter-based RNG keys dither by
        # element position, so rows 0..len(batch)-1 are unchanged.
        waves = np.zeros((batch_size, bucket), np.int16)
        for i, (_, n, w) in enumerate(batch):
            waves[i, :n] = pcm16(w[:bucket])
        if key is not None:
            key, sub = jax.random.split(key)
            feats = jit_fbank(waves, cfg, dither_key=sub)
        else:
            feats = jit_fbank(waves, cfg)
        # one flush stays in flight (JAX dispatch is async): the device
        # computes / the link transfers batch k while the host quantizes
        # batch k+1 and writes batch k-1's ark entries
        inflight.append((feats, bucket, batch))
        pending[bucket] = []
        if len(inflight) > 1:
            drain(1)

    def drain(keep: int = 0):
        nonlocal done
        while len(inflight) > keep:
            feats, bucket, batch = inflight.pop(0)
            feats = np.asarray(feats)  # materialize (device sync point)
            for i, (utt, n, _) in enumerate(batch):
                t = num_frames(min(n, bucket), cfg)
                writer.write(utt, feats[i, :t])
                utt2num[utt] = str(t)
                done += 1
                if progress_every and done % progress_every == 0:
                    print(f"  fbank: {done}/{len(keys)}")

    inflight: List[Tuple[object, int, list]] = []
    with cf.ThreadPoolExecutor(max_workers=io_threads) as pool:
        for utt, (samples, sr) in zip(
            keys, pool.map(lambda u: load_utterance(wav[u]), keys)
        ):
            assert sr == sample_rate, (utt, sr)
            n = min(len(samples), buckets[-1])
            b = _bucket_for(n, buckets)
            pending[b].append((utt, n, samples.astype(np.float32)))
            if len(pending[b]) >= batch_size:
                flush(b)
        for b in buckets:
            flush(b)
        drain()
    writer.close()

    datadir.write_two_column(os.path.join(data_dir, "utt2num_frames"), utt2num)
    return scp


def finalize_dataset(
    data_dir: str, feat_dim: int, num_shards: Sequence[int] = (8, 16, 32),
    shuffle_seed: int = 777,
) -> None:
    """Post-feature bookkeeping (ref prepare_data.sh:73-87): shuffled scp,
    spk list, utt2id.pkl, {N}-split shards."""
    scp = os.path.join(data_dir, f"fbank{feat_dim}.scp")
    datadir.shuffle_scp(scp, seed=shuffle_seed)
    utt2spk = datadir.read_two_column(os.path.join(data_dir, "utt2spk"))
    spks = sorted(set(utt2spk.values()))
    with open(os.path.join(data_dir, "spk"), "w") as f:
        f.write("\n".join(spks) + "\n")
    utt2id = datadir.build_utt2id(utt2spk, spks)
    datadir.save_utt2id(os.path.join(data_dir, "utt2id.pkl"), utt2id)
    for n in num_shards:
        datadir.shard_scp(scp, n)
