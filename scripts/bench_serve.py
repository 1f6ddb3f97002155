"""Online-serving throughput/latency on the real TPU (eval/serving.py).

Measures the dynamic-batching EmbeddingService under concurrent load: N
client threads each submit utterances with a VoxCeleb1-like length
distribution and wait for their embeddings.  Reported per concurrency
level:

* audio-s/s -- how much audio the server embeds per second (compare with
  scripts/bench_extract.py's offline pipeline rate: the batcher should
  recover offline extraction throughput once enough clients keep the
  bucket batches full);
* request latency p50/p95 -- what a caller experiences, including the
  max_wait batching deadline and queueing behind in-flight batches.

The reference has no comparable surface (serving there = re-running
batch-1 tf_extract.py, eval_inference_model.sh:27-40).

Usage: python scripts/bench_serve.py [model] [batch_size] [num_utts]
"""

import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def synthetic_corpus(num_utts: int, feat_dim: int, seed: int = 0):
    rng = np.random.default_rng(seed)
    secs = np.clip(rng.lognormal(np.log(8.0), 0.45, num_utts), 4.0, 60.0)
    frames = (secs * 100).astype(np.int32)
    return [rng.standard_normal((int(t), feat_dim), np.float32)
            for t in frames]


def main():
    cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    import tempfile

    from voxsrc2020_speaker_verification_tpu.eval.export import (
        export_inference_artifact,
    )
    from voxsrc2020_speaker_verification_tpu.eval.serving import (
        EmbeddingService,
    )
    from voxsrc2020_speaker_verification_tpu.training import (
        TrainConfig, create_train_state,
    )

    model = sys.argv[1] if len(sys.argv) > 1 else "res2net50_w24_s4_c32"
    batch_size = int(sys.argv[2]) if len(sys.argv) > 2 else None
    num_utts = int(sys.argv[3]) if len(sys.argv) > 3 else 512

    config = TrainConfig(model=model, feat_dim=80, bf16=True, exp_root="")
    state = create_train_state(config, jax.random.PRNGKey(0))

    with tempfile.TemporaryDirectory() as tmp:
        artifact = os.path.join(tmp, "artifact")
        export_inference_artifact(config, state, artifact)
        service = EmbeddingService(artifact, batch_size=batch_size,
                                  max_wait_ms=10.0)
        print(f"# model={model} batch={service.batch_size} "
              f"buckets={service.buckets}")

        corpus = synthetic_corpus(num_utts, config.feat_dim)

        # warmup: compile every bucket shape (sequential, covers cmvn too)
        for f in corpus[:6]:
            service.embed_features(f, timeout=900)

        def run(concurrency: int, sub):
            audio_s = sum(len(f) for f in sub) / 100.0
            latencies = []
            lat_lock = threading.Lock()
            queue = list(sub)
            q_lock = threading.Lock()

            def client():
                while True:
                    with q_lock:
                        if not queue:
                            return
                        f = queue.pop()
                    t0 = time.perf_counter()
                    service.embed_features(f, timeout=900)
                    dt = time.perf_counter() - t0
                    with lat_lock:
                        latencies.append(dt)

            t0 = time.perf_counter()
            threads = [threading.Thread(target=client)
                       for _ in range(concurrency)]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            wall = time.perf_counter() - t0
            lat = np.sort(latencies)
            return (audio_s / wall, lat[len(lat) // 2] * 1e3,
                    lat[int(len(lat) * 0.95)] * 1e3)

        for conc in (1, 16, 64):
            # low concurrency pays one padded batch per request -- keep its
            # pass short; saturated levels get the full corpus
            sub = corpus[: min(num_utts, max(48, 4 * conc))]
            rate, p50, p95 = run(conc, sub)
            print(f"concurrency={conc:4d}  utts={len(sub):4d}  "
                  f"audio_s_per_s={rate:7.0f}  "
                  f"latency_p50={p50:7.0f} ms  p95={p95:7.0f} ms",
                  flush=True)
        service.close()


if __name__ == "__main__":
    main()
