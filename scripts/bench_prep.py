"""Data-prep throughput: wav tree -> device FBANK -> CM ark, on the real
chip (the production cli.prepare_data stage-4 path,
data/features.py:compute_features_for_dir).

The reference's full prep is ~10 h on 48 vCPUs (ref README.md:43) with
Kaldi's CPU compute-fbank-feats | copy-feats --compress doing the feature
leg for 6.55 M utterances (~54 M audio-s for vox2_dev + its 5x aug).  This
measures our audio-s/s for the same leg and extrapolates.

Usage: python scripts/bench_prep.py [num_utts] [feat_dim]
"""

import os
import sys
import tempfile
import time
import wave as wavemod

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SR = 16000


def write_wav(path, samples):
    with wavemod.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(SR)
        w.writeframes(samples.astype(np.int16).tobytes())


def main():
    num_utts = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    feat_dim = int(sys.argv[2]) if len(sys.argv) > 2 else 80

    import jax
    cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from voxsrc2020_speaker_verification_tpu.data.features import (
        compute_features_for_dir,
    )
    from voxsrc2020_speaker_verification_tpu.utils import datadir

    rng = np.random.default_rng(0)
    with tempfile.TemporaryDirectory() as root:
        dd = os.path.join(root, "ds")
        wavs = os.path.join(root, "wav")
        os.makedirs(dd)
        os.makedirs(wavs)
        # VoxCeleb-like length distribution (log-normal around 8 s)
        secs = np.clip(rng.lognormal(np.log(8.0), 0.45, num_utts), 4.0, 30.0)
        total_audio = float(secs.sum())
        wav_scp = {}
        for i, s in enumerate(secs):
            p = os.path.join(wavs, f"u{i:05d}.wav")
            write_wav(p, rng.normal(0, 2000, int(s * SR)))
            wav_scp[f"u{i:05d}"] = p
        datadir.write_two_column(os.path.join(dd, "wav.scp"), wav_scp)

        # warmup pass compiles EVERY bucket shape the timed corpus can hit
        from voxsrc2020_speaker_verification_tpu.data.features import (
            DEFAULT_BUCKETS_S,
        )
        dd2 = os.path.join(root, "warm")
        os.makedirs(dd2)
        warm = {}
        for b in DEFAULT_BUCKETS_S:
            if b > 30 + 2:
                break
            p = os.path.join(wavs, f"warm{b}.wav")
            write_wav(p, rng.normal(0, 2000, int(min(b, 30) * SR) - 1))
            warm[f"warm{b}"] = p
        datadir.write_two_column(os.path.join(dd2, "wav.scp"), warm)
        compute_features_for_dir(dd2, feat_dim, dither_seed=7, batch_size=16)

        t0 = time.perf_counter()
        scp = compute_features_for_dir(dd, feat_dim, dither_seed=7)
        dt = time.perf_counter() - t0
        n_lines = sum(1 for _ in open(scp))
        assert n_lines == num_utts, (n_lines, num_utts)

    rate = total_audio / dt
    # vox2_dev (1.09 M utts, ~8.25 s mean) + 5x aug ~= 54 M audio-s
    full_h = 54e6 / rate / 3600
    print(f"# {num_utts} utts, {total_audio:.0f} audio-s, feat_dim={feat_dim}")
    print(f"prep_audio_s_per_s={rate:.0f}  "
          f"# wav->device FBANK->CM ark; est. vox2_dev+aug feature leg "
          f"{full_h:.2f} h on one chip (ref: inside a ~10 h 48-vCPU prep)")


if __name__ == "__main__":
    main()
