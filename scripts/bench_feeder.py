"""Host feeder throughput: Python BatchFeeder vs native C++ vox_feeder.

Feature mode (default) builds a synthetic feature corpus (CM-compressed,
like the reference's copy-feats --compress arks, ref prepare_data.sh:69)
and measures optimizer-step batches/s through each feeder at the bench
shape (256x4 x 200 frames x 80 dims, sliding CMN on).

Raw mode (--raw) builds a synthetic wav corpus + the 5x `_aug` layout
(JSON reverb/noise/music/babble specs, data/augment.py) and measures the
north-star host path: wav decode + online spec rendering + waveform crop.
The number to beat is the DEVICE demand of the model being fed
(PERF.md: ~1100 audio-s/s for res2net50_w24_s4_c32, 75k for the TDNN).

Usage: python scripts/bench_feeder.py [num_utts] [batch] [accum] [--raw]
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


def build_wav_corpus(root, num_utts, seconds=(3.0, 8.0), sample_rate=16000):
    """Synthetic VoxCeleb-like wav tree + utt2spk/utt2dur + MUSAN/RIR pools,
    then the 5x `_aug` dir of JSON augmentation specs (data/augment.py)."""
    from voxsrc2020_speaker_verification_tpu.data import audio
    from voxsrc2020_speaker_verification_tpu.data.augment import (
        augment_data_dir,
    )
    from voxsrc2020_speaker_verification_tpu.utils import datadir

    rng = np.random.RandomState(0)
    src = os.path.join(root, "wav")
    os.makedirs(src)
    wav, utt2spk, utt2dur, utt2id = {}, {}, {}, {}
    for i in range(num_utts):
        utt = f"u{i:05d}"
        dur = rng.uniform(*seconds)
        n = int(dur * sample_rate)
        path = os.path.join(src, utt + ".wav")
        audio.write_wav(path, (rng.randn(n) * 2000.0).astype(np.float32))
        wav[utt] = path
        utt2spk[utt] = f"spk{i % 40:03d}"
        utt2dur[utt] = f"{dur:.2f}"
        utt2id[utt] = i % 40

    def noise_pool(name, n_files, lo, hi):
        d = os.path.join(root, name)
        os.makedirs(d)
        pool = {}
        for j in range(n_files):
            dur = rng.uniform(lo, hi)
            p = os.path.join(d, f"{name}{j:03d}.wav")
            audio.write_wav(
                p, (rng.randn(int(dur * sample_rate)) * 1500.0)
                .astype(np.float32))
            pool[p] = dur
        return pool

    rirs = []
    rir_dir = os.path.join(root, "rirs")
    os.makedirs(rir_dir)
    for j in range(12):
        t = int(0.4 * sample_rate)
        rir = rng.randn(t) * np.exp(-np.arange(t) / (0.05 * sample_rate))
        rir[0] = 2.0  # direct path peak
        p = os.path.join(rir_dir, f"rir{j:02d}.wav")
        audio.write_wav(p, (rir * 8000.0).astype(np.float32))
        rirs.append(p)

    data_dir = os.path.join(root, "corpus")
    os.makedirs(data_dir)
    datadir.write_two_column(os.path.join(data_dir, "wav.scp"), wav)
    datadir.write_two_column(os.path.join(data_dir, "utt2spk"), utt2spk)
    datadir.write_two_column(os.path.join(data_dir, "utt2dur"), utt2dur)

    aug_dir = os.path.join(root, "corpus_aug")
    augment_data_dir(
        data_dir, aug_dir,
        rir_sets=[(0.5, rirs[:6]), (0.5, rirs[6:])],
        musan_noise=noise_pool("noise", 10, 2.0, 6.0),
        musan_music=noise_pool("music", 6, 6.0, 12.0),
        musan_speech=noise_pool("speech", 10, 4.0, 10.0),
        utt2dur={k: float(v) for k, v in utt2dur.items()},
    )
    aug_utt2id = {}
    for utt in datadir.read_two_column(
            os.path.join(aug_dir, "wav.scp")):
        base = utt.rsplit("-", 1)[0] if "-" in utt else utt
        aug_utt2id[utt] = utt2id[base]
    return data_dir, aug_dir, utt2id, aug_utt2id


def timed(feeder, batch, accum, n_batches, warmup=2, min_seconds=10.0):
    """Steady-state producer rate: drain the warmup + queue prefill, then
    consume for at least `n_batches` AND `min_seconds` (a short window
    mostly measures the depth-2 queue buffer, not the producers)."""
    it = iter(feeder)
    for _ in range(warmup):
        next(it)
    t0 = time.perf_counter()
    done = 0
    while done < n_batches or time.perf_counter() - t0 < min_seconds:
        next(it)
        done += 1
    dt = time.perf_counter() - t0
    samples = done * batch * accum
    return samples / dt, samples * FEAT_LEN / 100.0 / dt


def run_raw(num_utts, batch, accum, threads):
    """North-star host path: wav decode + online aug render + crop."""
    from voxsrc2020_speaker_verification_tpu.data.raw_dataset import (
        RawAudioShardDataset,
    )
    from voxsrc2020_speaker_verification_tpu.ops.fbank import FbankConfig

    cfg = FbankConfig(num_bins=FEAT_DIM)
    with tempfile.TemporaryDirectory() as root:
        data_dir, aug_dir, utt2id, aug_utt2id = build_wav_corpus(
            root, num_utts)
        for tag, d, ids in (("plain wavs", data_dir, utt2id),
                            ("5x aug specs", aug_dir, aug_utt2id)):
            n_batches = max(2, (len(ids) * 2) // (batch * accum))
            print(f"# raw corpus [{tag}]: {len(ids)} utts, shape "
                  f"{batch}x{accum}, {n_batches} step-batches, "
                  f"{threads} workers", flush=True)
            feeders = [
                RawAudioShardDataset(
                    os.path.join(d, "wav.scp"), ids, FEAT_LEN, cfg=cfg,
                    shard_index=i, num_shards=threads, seed=i)
                for i in range(threads)
            ]
            py = BatchFeeder(feeders, batch, accum).start()
            try:
                sps, audio = timed(py, batch, accum, n_batches)
                print(f"python raw feeder [{tag}]: {sps:8.0f} samples/s  "
                      f"{audio:8.0f} audio-s/s", flush=True)
            finally:
                py.stop()

            if hasattr(native, "NativeRawBatchFeeder") and \
                    native.available() and hasattr(native.get_lib(),
                                                   "vox_raw_feeder_create"):
                nat = native.NativeRawBatchFeeder(
                    os.path.join(d, "wav.scp"), ids, FEAT_LEN, batch, accum,
                    cfg=cfg, num_threads=threads)
                try:
                    sps, audio = timed(nat, batch, accum, n_batches)
                    print(f"native raw feeder [{tag}]: {sps:8.0f} samples/s"
                          f"  {audio:8.0f} audio-s/s", flush=True)
                finally:
                    nat.close()
            else:
                print("native raw feeder unavailable", flush=True)


def main():
    args = [a for a in sys.argv[1:] if a != "--raw"]
    raw = "--raw" in sys.argv[1:]
    num_utts = int(args[0]) if len(args) > 0 else (500 if raw else 2000)
    batch = int(args[1]) if len(args) > 1 else 256
    accum = int(args[2]) if len(args) > 2 else 4
    n_batches = max(2, (num_utts * 3) // (batch * accum))
    threads = min(8, os.cpu_count() or 4)

    if raw:
        run_raw(num_utts, batch, accum, threads)
        return

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
