"""North-star system benchmark on real hardware: raw audio end to end.

Synthesizes a VoxCeleb-like wav corpus with the 5x `_aug` JSON-spec layout,
feeds it through the native C++ raw feeder (wav decode + online reverb/noise
rendering + int16 crop, native/vox_raw.cc), transfers int16 waveform crops,
and runs the FULL raw-mode train step (on-device FBANK + sliding CMVN inside
the jitted step, ops/pipeline.py) -- the "no feature store" path whose
host and device legs PERF.md measures separately.

Usage: python scripts/bench_raw_system.py [model] [batch] [accum] [num_utts]
       [frames] [remat_stages e.g. 0,1,2]

NB on the axon tunnel: raw int16 crops are ~160 KB/sample (5x a bf16
feature crop), so the host->device link dominates here in a way a TPU-VM's
local PCIe would not; the printed transfer-bound gap quantifies it.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    model = sys.argv[1] if len(sys.argv) > 1 else "res2net50_w24_s4_c32"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    accum = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    num_utts = int(sys.argv[4]) if len(sys.argv) > 4 else 400
    frames = int(sys.argv[5]) if len(sys.argv) > 5 else 200
    stages = (tuple(int(s) for s in sys.argv[6].split(","))
              if len(sys.argv) > 6 else None)

    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    import tempfile

    from bench_feeder import build_wav_corpus  # sibling script
    from voxsrc2020_speaker_verification_tpu.data import native
    from voxsrc2020_speaker_verification_tpu.ops.fbank import FbankConfig
    from voxsrc2020_speaker_verification_tpu.training import (
        TrainConfig, create_train_state, make_train_step,
    )
    from voxsrc2020_speaker_verification_tpu.training.loop import (
        device_prefetch,
    )

    config = TrainConfig(
        model=model, projection="sc_cm_linear", num_classes=5994,
        dataset_length=5_460_045, feat_dim=80, feat_length=frames,
        batch_size=batch, num_accumulation_steps=accum,
        bf16=True, bn_groups=8, raw_audio=True,
        remat=stages is not None, remat_stages=stages,
    )
    fb = FbankConfig(num_bins=config.feat_dim, dither=config.dither)
    dev = jax.devices()[0]
    print(f"# {dev.platform} {getattr(dev, 'device_kind', '?')} "
          f"model={model} shape={batch}x{accum} f{frames} raw-audio "
          f"remat_stages={stages}", file=sys.stderr)

    with tempfile.TemporaryDirectory() as root:
        # long crops (LMFT f600) want utterances that mostly cover them
        seconds = (3.0, 8.0) if frames <= 300 else (7.0, 14.0)
        _, aug_dir, _, aug_utt2id = build_wav_corpus(
            root, num_utts, seconds=seconds)
        # remap labels into the class range
        ids = {u: v % config.num_classes for u, v in aug_utt2id.items()}
        threads = min(8, os.cpu_count() or 4)
        feeder = native.NativeRawBatchFeeder(
            os.path.join(aug_dir, "wav.scp"), ids, config.feat_length,
            batch, accum, cfg=fb, context=config.cmn_context,
            num_threads=threads, seed=0)
        state = create_train_state(config, jax.random.PRNGKey(0))
        step = jax.jit(make_train_step(config), donate_argnums=0)
        rng = jax.random.PRNGKey(3)
        try:
            it = device_prefetch(
                iter(feeder),
                lambda fl: (jax.tree.map(jnp.asarray, fl[0]),
                            jnp.asarray(fl[1])),
                depth=2)
            for _ in range(2):  # compile + warm
                feats, labels = next(it)
                state, metrics = step(state, feats, labels, rng)
            _ = float(metrics["loss"])
            iters = 6
            t0 = time.perf_counter()
            for _ in range(iters):
                feats, labels = next(it)
                state, metrics = step(state, feats, labels, rng)
            loss = float(metrics["loss"])
            dt = (time.perf_counter() - t0) / iters
        finally:
            feeder.close()

    audio_s = config.effective_batch * config.feat_length / 100.0
    wave_mb = (config.effective_batch
               * feats[0].shape[-1] * 2 / 1e6)
    print(f"# loss {loss:.3f}  wire {wave_mb:.0f} MB/step int16",
          file=sys.stderr)
    print(f"raw system: {dt * 1000:8.1f} ms/step  "
          f"{audio_s / dt:8.0f} audio-s/s/chip")


if __name__ == "__main__":
    main()
