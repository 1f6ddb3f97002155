"""Host feeder throughput: Python BatchFeeder vs native C++ vox_feeder.

Builds a synthetic feature corpus (CM-compressed, like the reference's
copy-feats --compress arks, ref prepare_data.sh:69) and measures
optimizer-step batches/s through each feeder at the bench shape
(256x4 x 200 frames x 80 dims, sliding CMN on).

Usage: python scripts/bench_feeder.py [num_utts] [batch] [accum]
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from voxsrc2020_speaker_verification_tpu.data import kaldi_io, native
from voxsrc2020_speaker_verification_tpu.data.dataset import (
    BatchFeeder, FeatureShardDataset,
)

FEAT_DIM = 80
FEAT_LEN = 200


def build_corpus(root, num_utts, num_shards=4):
    rng = np.random.RandomState(0)
    utt2id, shards = {}, []
    for s in range(num_shards):
        ark = os.path.join(root, f"feats.{s + 1}.ark")
        scp = os.path.join(root, f"feats.{s + 1}.scp")
        with kaldi_io.ArkScpWriter(ark, scp, compress=True) as w:
            for i in range(num_utts // num_shards):
                key = f"u{s:02d}_{i:05d}"
                t = rng.randint(200, 400)  # ~2-4 s utterances
                w.write(key, rng.randn(t, FEAT_DIM).astype(np.float32))
                utt2id[key] = (s * 997 + i) % 5994
        shards.append(scp)
    return shards, utt2id


def timed(feeder, batch, accum, n_batches, warmup=2):
    it = iter(feeder)
    for _ in range(warmup):
        next(it)
    t0 = time.perf_counter()
    for _ in range(n_batches):
        f, l = next(it)
    dt = time.perf_counter() - t0
    samples = n_batches * batch * accum
    return samples / dt, samples * FEAT_LEN / 100.0 / dt


def main():
    num_utts = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    accum = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    n_batches = max(2, (num_utts * 3) // (batch * accum))
    threads = min(8, os.cpu_count() or 4)

    with tempfile.TemporaryDirectory() as root:
        shards, utt2id = build_corpus(root, num_utts)
        print(f"# corpus: {num_utts} CM utts, shape {batch}x{accum}, "
              f"{n_batches} step-batches, {threads} workers", flush=True)

        py = BatchFeeder(
            [FeatureShardDataset(p, utt2id, FEAT_DIM, FEAT_LEN, seed=i)
             for i, p in enumerate(shards * (threads // len(shards) or 1))],
            batch, accum, wire_bf16=True).start()
        try:
            sps, audio = timed(py, batch, accum, n_batches)
            print(f"python feeder:  {sps:8.0f} samples/s  "
                  f"{audio:8.0f} audio-s/s", flush=True)
        finally:
            py.stop()

        if native.available() and hasattr(native.get_lib(),
                                          "vox_feeder_create"):
            nat = native.NativeBatchFeeder(
                shards, utt2id, FEAT_DIM, FEAT_LEN, batch, accum,
                num_threads=threads, wire_bf16=True)
            try:
                sps, audio = timed(nat, batch, accum, n_batches)
                print(f"native feeder:  {sps:8.0f} samples/s  "
                      f"{audio:8.0f} audio-s/s", flush=True)
            finally:
                nat.close()
        else:
            print("native feeder unavailable", flush=True)


if __name__ == "__main__":
    main()
