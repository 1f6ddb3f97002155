"""Embedding-extraction throughput on the real TPU (eval path).

The reference extracts embeddings one utterance at a time per GPU with a
dynamic-shape frozen graph (/root/reference/tf_extract.py:96-111,
eval_inference_model.sh:27-40 -- 8 parallel batch-1 processes).  Here
extraction is bucketed, batched, and masked (eval/extract.py), so one chip
sees large static batches.  This script measures audio-seconds/second of
the FULL production path -- sliding CMVN on device + chunking + bucketed
batched forward + length-weighted chunk averaging -- over a synthetic corpus
with a VoxCeleb1-like utterance-length distribution (log-normal, median
~8 s, clipped to [4 s, 60 s]; VoxCeleb1 mean is 8.25 s).

Usage: python scripts/bench_extract.py [model] [batch_size] [num_utts] [wire] [cmvn]
(wire: float32 | bfloat16 -- the host->device feature wire format;
 cmvn: device | host -- where sliding CMVN runs; "host" skips the CMVN
 device round trip so features cross the link once, not three times)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def synthetic_corpus(num_utts: int, feat_dim: int, seed: int = 0):
    """(utt, (T, F) float32) pairs, VoxCeleb1-like length distribution."""
    rng = np.random.default_rng(seed)
    # log-normal around 8 s (800 frames at 10 ms), sigma 0.45, clip 4..60 s
    secs = np.clip(rng.lognormal(np.log(8.0), 0.45, num_utts), 4.0, 60.0)
    frames = (secs * 100).astype(np.int32)
    for i, t in enumerate(frames):
        yield f"utt{i:06d}", rng.standard_normal((int(t), feat_dim), np.float32)


def main():
    cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from voxsrc2020_speaker_verification_tpu.cli.extract import cmvn_full_stream
    from voxsrc2020_speaker_verification_tpu.eval.extract import (
        extract_embeddings, make_bucketed_embed_fn,
    )
    from voxsrc2020_speaker_verification_tpu.training import (
        TrainConfig, build_speaker_net,
    )
    from voxsrc2020_speaker_verification_tpu.training.speaker_net import SpeakerNet

    model = sys.argv[1] if len(sys.argv) > 1 else "res2net50_w24_s4_c32"
    batch_size = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    num_utts = int(sys.argv[3]) if len(sys.argv) > 3 else 2000
    wire = sys.argv[4] if len(sys.argv) > 4 else "float32"
    cmvn = sys.argv[5] if len(sys.argv) > 5 else "device"
    assert cmvn in ("device", "host"), cmvn
    from voxsrc2020_speaker_verification_tpu.eval.extract import (
        resolve_wire_dtype,
    )

    wire_dtype = resolve_wire_dtype(wire)  # raises on typos: the printed
    # `wire=` tag in the results line must never mislabel a measurement

    config = TrainConfig(model=model, feat_dim=80, bf16=True)
    net = build_speaker_net(config)
    feats0 = np.zeros((2, 200, config.feat_dim), np.float32)
    variables = net.init(jax.random.PRNGKey(0), feats0,
                         np.zeros((2,), np.int32), config.scale, 0.0, True)

    @jax.jit
    def embed(feats, mask):
        feats = feats.astype("float32")  # accepts the bf16 wire
        return net.apply(
            {"params": variables["params"], "batch_stats": variables["batch_stats"]},
            feats, mask, method=SpeakerNet.embed,
        )

    fn = make_bucketed_embed_fn(embed, batch_size=batch_size)

    from voxsrc2020_speaker_verification_tpu.data.dataset import sliding_cmn_np

    def run(n, seed):
        raw_stream = synthetic_corpus(n, config.feat_dim, seed)
        if cmvn == "host":
            stream = ((u, sliding_cmn_np(f)) for u, f in raw_stream)
        else:
            stream = cmvn_full_stream(raw_stream,
                                      batch_size=max(8, batch_size // 4))
        total_frames = [0]

        def counted():
            for utt, f in stream:
                total_frames[0] += len(f)
                yield utt, f

        t0 = time.perf_counter()
        emb = extract_embeddings(fn, counted(), batch_size=batch_size,
                                 wire_dtype=wire_dtype)
        # extract_embeddings materializes every result via np.asarray inside
        # each flush, so all device work is already synchronized here.
        _ = float(next(iter(emb.values()))[0])
        dt = time.perf_counter() - t0
        return total_frames[0] / 100.0, dt, len(emb)

    # warmup pass compiles every (bucket, batch) shape
    run(min(400, num_utts), seed=123)
    audio_s, dt, n = run(num_utts, seed=0)
    print(f"# model={model} batch={batch_size} utts={n} wire={wire} "
          f"cmvn={cmvn} audio={audio_s:.0f}s wall={dt:.1f}s")
    print(f"pipeline_audio_s_per_s={audio_s / dt:.0f}  "
          f"# includes host->device feature streaming (tunnel-bound on axon)")

    # device-resident forward: the TPU-side extraction rate with features
    # already on device (what a TPU VM with local PCIe approaches)
    rng = np.random.default_rng(1)
    feats = jax.device_put(rng.standard_normal(
        (batch_size, 1000, config.feat_dim)).astype(np.float32))
    mask = jax.device_put(np.ones((batch_size, 1000), np.float32))
    _ = float(np.asarray(embed(feats, mask))[0, 0])
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        out = embed(feats, mask)
    _ = float(np.asarray(out)[0, 0])
    per_call = (time.perf_counter() - t0) / iters
    rate = batch_size * 10.0 / per_call
    print(f"device_forward_audio_s_per_s={rate:.0f}  "
          f"# (B={batch_size}, 1000 fr) {per_call * 1e3:.1f} ms/call")


if __name__ == "__main__":
    main()
