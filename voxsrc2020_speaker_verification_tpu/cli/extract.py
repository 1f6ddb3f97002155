"""Embedding extraction CLI.

Replaces the reference's per-GPU tf_extract.py orchestration
(/root/reference/eval_inference_model.sh:27-40, tf_extract.py:45-113):

    python -m voxsrc2020_speaker_verification_tpu.cli.extract \
        --artifact exp/.../artifact --data-dir data/voxceleb1 \
        --out data/voxceleb1/xvector

Differences by design (see eval/extract.py): instead of 8 batch-1 dynamic-
shape processes, one device runs large static bucket batches with masked
pooling.  Sliding CMVN is applied over the FULL utterance before chunking
-- exactly like the reference's apply-cmvn-sliding feeder pipe
(tf_extract.py:63) that precedes the 1000-frame chunk loop -- on device in
length-bucketed batches.  Chunk-averaging semantics are reference-exact.
"""

from __future__ import annotations

import argparse
import os
from typing import Optional

import numpy as np


def cmvn_full_stream(
    stream,
    window: int = 300,
    batch_size: int = 8,
    bucket_frames=(500, 1000, 2000, 4000, 8000, 16000),
):
    """(utt, raw (T, F) feats) -> (utt, CMVN'd (T, F) feats), normalizing
    each FULL utterance (ref tf_extract.py:63 applies apply-cmvn-sliding to
    the whole utterance before chunking; per-chunk CMVN would change the
    statistics near internal chunk boundaries).  Runs on device in
    length-bucketed batches -- one compile per bucket, one dispatch per
    `batch_size` utterances."""
    import functools

    import jax

    from ..ops.cmvn import sliding_cmvn

    @functools.partial(jax.jit, static_argnames=("w",))
    def cmvn(feats, num_valid, w):
        return sliding_cmvn(feats, num_valid, window=w, center=True)

    pending = {b: [] for b in bucket_frames}

    def flush(bucket, batch):
        if not batch:
            return
        # pad tail batches to batch_size: one compile per bucket, not one
        # per distinct remainder.  Overlong batch-1 exact-length calls keep
        # their own (1, T, F) shape -- padding those would multiply device
        # memory by batch_size exactly where the utterance is longest.
        rows = (batch_size if bucket in pending and len(batch) < batch_size
                else len(batch))
        f = np.zeros((rows, bucket, batch[0][1].shape[1]), np.float32)
        n = np.ones(rows, np.int32)  # 1 valid frame in pad rows: no 0-div
        for i, (_, feat) in enumerate(batch):
            f[i, : len(feat)] = feat
            n[i] = len(feat)
        out = np.asarray(cmvn(f, n, window))
        for i, (utt, feat) in enumerate(batch):
            yield utt, out[i, : len(feat)]

    for utt, feat in stream:
        t = len(feat)
        bucket = next((b for b in bucket_frames if t <= b), None)
        if bucket is None:  # beyond the largest bucket: exact length, batch-1
            yield from flush(t, [(utt, feat)])
            continue
        pending[bucket].append((utt, feat))
        if len(pending[bucket]) >= batch_size:
            yield from flush(bucket, pending[bucket])
            pending[bucket] = []
    for b, batch in pending.items():
        yield from flush(b, batch)


def wave_feature_stream(
    wav_scp: str,
    feat_dim: int,
    *,
    batch_size: int = 16,
    bucket_seconds=(4, 8, 16, 32, 64, 128),
    sample_rate: int = 16000,
):
    """Stream (utt, (T, F) raw fbank features) straight from a wav.scp --
    device-batched by audio-length bucket, no feature store.  CMVN is NOT
    applied here; pipe the stream through cmvn_full_stream (full-utterance
    window semantics) before chunking."""
    import jax

    from ..data import native
    from ..data.augment import load_utterance as load_utterance_py
    from ..ops.fbank import FbankConfig, fbank_i16, num_frames, pcm16
    from ..utils import datadir

    # C++ renderer when built (native/vox_raw.cc, parity-tested against the
    # Python implementation in tests/test_native_raw.py); Python fallback
    if native.available() and hasattr(native.get_lib(), "vox_render_spec"):
        load_utterance = native.render_spec
    else:
        load_utterance = load_utterance_py

    cfg = FbankConfig(num_bins=feat_dim, dither=0.0)
    # int16 wire (ops.fbank.fbank_i16): halves the host->device transfer
    jit_fbank = jax.jit(fbank_i16, static_argnames=("cfg",))
    buckets = [s * sample_rate for s in bucket_seconds]
    pending = {b: [] for b in buckets}

    def flush(bucket):
        batch = pending[bucket]
        if not batch:
            return
        # pad tail batches (one compile per bucket) + int16 wire
        waves = np.zeros((batch_size, bucket), np.int16)
        for i, (_, w) in enumerate(batch):
            waves[i, : len(w)] = pcm16(w[:bucket])
        feats = np.asarray(jit_fbank(waves, cfg))
        for i, (utt, w) in enumerate(batch):
            t = num_frames(min(len(w), bucket), cfg)
            yield utt, feats[i, :t]
        pending[bucket] = []

    wav = datadir.read_two_column(wav_scp)
    for utt in sorted(wav):
        samples, sr = load_utterance(wav[utt])
        assert sr == sample_rate, (utt, sr)
        b = next((b for b in buckets if len(samples) <= b), buckets[-1])
        pending[b].append((utt, samples.astype(np.float32)))
        if len(pending[b]) >= batch_size:
            yield from flush(b)
    for b in buckets:
        yield from flush(b)


def extract_dataset(
    artifact_dir: str,
    data_dir: str,
    out_prefix: str,
    *,
    batch_size: Optional[int] = None,
    cmn_window: int = 300,
    scp_name: str = None,
    raw: bool = False,
    progress_every: int = 2000,
    num_devices: int = 0,
    wire: str = "float32",
    cmvn: str = "host",
) -> str:
    """Extract embeddings for every utterance in a data dir -> ark/scp.
    `raw` streams wav.scp with on-device FBANK instead of a feature scp.
    `num_devices` > 1 fans the batch axis out over a device mesh (GSPMD
    data parallelism, the reference's 8-GPU extraction fan-out
    eval_inference_model.sh:27-40); 0 = all local devices.
    `cmvn` picks where sliding CMVN runs: "host" (default --
    `data.dataset.sliding_cmn_np`, the same numerics the production
    training feeder uses, parity-asserted in tests/test_data.py and
    vs the device path in tests/test_export_eval.py) or "device"
    (bucketed batches).  Host CMVN means the feature bytes cross the
    host<->device link ONCE instead of three times (h2d + d2h for the
    CMVN round trip, then h2d again for the forward) and removes the
    per-batch CMVN sync point: measured 4.0x pipeline extraction
    throughput on the transfer-bound v5e tunnel (PERF.md), at a trivial
    host-CPU cost (a float64 cumsum per utterance).
    Returns the scp path."""
    import jax

    from ..data import kaldi_io
    from ..eval.export import load_inference_artifact
    from ..eval.extract import (
        default_batch_size, extract_embeddings, make_bucketed_embed_fn,
    )

    mesh = None
    n_dev = num_devices if num_devices > 0 else len(jax.devices())
    if n_dev > 1:
        from jax.sharding import Mesh

        mesh = Mesh(np.asarray(jax.devices()[:n_dev]), ("data",))

    config, embed = load_inference_artifact(artifact_dir, mesh=mesh)
    if batch_size is None:
        # measured-best bucket batch per model class (PERF.md: 128 is 2.4x
        # faster than 64 for w24/att-class models on v5e)
        batch_size = default_batch_size(config.model)
    if n_dev > 1 and batch_size % n_dev:
        batch_size = -(-batch_size // n_dev) * n_dev  # round up
    fn = make_bucketed_embed_fn(embed, batch_size=batch_size)

    if raw:
        stream = wave_feature_stream(
            os.path.join(data_dir, "wav.scp"), config.feat_dim,
            batch_size=batch_size,
        )
    else:
        scp = os.path.join(data_dir, scp_name or f"fbank{config.feat_dim}.scp")
        stream = kaldi_io.read_mat_scp(scp)
    if cmvn == "host":
        from ..data.dataset import sliding_cmn_np

        stream = ((utt, sliding_cmn_np(feat, cmn_window))
                  for utt, feat in stream)
    elif cmvn == "device":
        stream = cmvn_full_stream(stream, window=cmn_window)
    else:
        raise ValueError(f"cmvn must be device|host, got {cmvn!r}")

    def feature_stream():
        for i, (utt, feat) in enumerate(stream):
            if progress_every and i and i % progress_every == 0:
                print(f"  extract: {i} utts")
            yield utt, feat

    from ..eval.extract import resolve_wire_dtype

    wire_dtype = resolve_wire_dtype(wire)
    embeddings = extract_embeddings(fn, feature_stream(),
                                    batch_size=batch_size,
                                    wire_dtype=wire_dtype)

    ark, out_scp = out_prefix + ".ark", out_prefix + ".scp"
    with kaldi_io.ArkScpWriter(ark, out_scp) as w:
        for utt in sorted(embeddings):
            w.write(utt, embeddings[utt])
    return out_scp


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__,
                                formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("--artifact", required=True,
                   help="inference artifact dir (cli.export output)")
    p.add_argument("--data-dir", required=True)
    p.add_argument("--out", required=True, help="output ark/scp path prefix")
    p.add_argument("--scp-name", default=None,
                   help="feature scp filename (default fbank<feat_dim>.scp)")
    p.add_argument("--batch-size", type=int, default=None,
                   help="bucket batch (default: measured-best per model "
                        "class -- 128 for w24/att Res2Nets, 64 otherwise)")
    p.add_argument("--cmn-window", type=int, default=300)
    p.add_argument("--raw", action="store_true",
                   help="stream wav.scp with on-device FBANK (no feature store)")
    p.add_argument("--num-devices", type=int, default=0,
                   help="devices to fan the batch over (0 = all local)")
    p.add_argument("--wire", choices=("float32", "bfloat16"),
                   default="float32",
                   help="host->device feature wire format; bfloat16 halves "
                        "the transfer (bit-identical for bf16-compute "
                        "models, 8-mantissa-bit quantization otherwise)")
    p.add_argument("--cmvn", choices=("device", "host"), default="host",
                   help="where sliding CMVN runs; 'host' (default) avoids "
                        "the CMVN device round trip (features cross the "
                        "link once, not three times; 4.0x measured pipeline "
                        "throughput, PERF.md) at a small host-CPU cost")
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)

    scp = extract_dataset(
        args.artifact, args.data_dir, args.out,
        scp_name=args.scp_name, batch_size=args.batch_size,
        cmn_window=args.cmn_window, raw=args.raw,
        num_devices=args.num_devices, wire=args.wire, cmvn=args.cmvn,
    )
    print(f"embeddings at {scp}")


if __name__ == "__main__":
    main()
