"""Embedding extraction CLI.

Replaces the reference's per-GPU tf_extract.py orchestration
(/root/reference/eval_inference_model.sh:27-40, tf_extract.py:45-113):

    python -m voxsrc2020_speaker_verification_tpu.cli.extract \
        --artifact exp/.../artifact --data-dir data/voxceleb1 \
        --out data/voxceleb1/xvector

Differences by design (see eval/extract.py): instead of 8 batch-1 dynamic-
shape processes, one device runs large static bucket batches with masked
pooling; sliding CMVN (the reference's apply-cmvn-sliding feeder pipe,
tf_extract.py:63) is fused into the jitted embed function.  Chunk-averaging
semantics are reference-exact.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def make_cmvn_embed_fn(embed_fn, window: int = 300):
    """Wrap a jitted embed fn with on-device sliding CMVN (center, mean-only,
    300 frames -- ref tf_train_tdnn.py:83 / tf_extract.py:63)."""
    import jax

    from ..ops.cmvn import sliding_cmvn

    @jax.jit
    def fn(feats, mask):
        num_valid = mask.sum(axis=1).astype("int32")
        feats = sliding_cmvn(feats, num_valid, window=window, center=True)
        return embed_fn(feats, mask)

    return fn


def extract_dataset(
    artifact_dir: str,
    data_dir: str,
    out_prefix: str,
    *,
    feat_name: str = None,
    batch_size: int = 32,
    cmn_window: int = 300,
    scp_name: str = None,
    progress_every: int = 2000,
) -> str:
    """Extract embeddings for every utterance in a data dir -> ark/scp.
    Returns the scp path."""
    from ..data import kaldi_io
    from ..eval.export import load_inference_artifact
    from ..eval.extract import extract_embeddings, make_bucketed_embed_fn

    config, embed = load_inference_artifact(artifact_dir)
    fn = make_bucketed_embed_fn(make_cmvn_embed_fn(embed, window=cmn_window))

    scp = os.path.join(
        data_dir, scp_name or feat_name or f"fbank{config.feat_dim}.scp"
    )

    def feature_stream():
        for i, (utt, feat) in enumerate(kaldi_io.read_mat_scp(scp)):
            if progress_every and i and i % progress_every == 0:
                print(f"  extract: {i} utts")
            yield utt, feat

    embeddings = extract_embeddings(fn, feature_stream(), batch_size=batch_size)

    ark, out_scp = out_prefix + ".ark", out_prefix + ".scp"
    with kaldi_io.ArkScpWriter(ark, out_scp) as w:
        for utt in sorted(embeddings):
            w.write(utt, embeddings[utt])
    return out_scp


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__,
                                formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("--artifact", required=True,
                   help="inference artifact dir (cli.export output)")
    p.add_argument("--data-dir", required=True)
    p.add_argument("--out", required=True, help="output ark/scp path prefix")
    p.add_argument("--scp-name", default=None,
                   help="feature scp filename (default fbank<feat_dim>.scp)")
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--cmn-window", type=int, default=300)
    args = p.parse_args(argv)

    scp = extract_dataset(
        args.artifact, args.data_dir, args.out,
        scp_name=args.scp_name, batch_size=args.batch_size,
        cmn_window=args.cmn_window,
    )
    print(f"embeddings at {scp}")


if __name__ == "__main__":
    main()
