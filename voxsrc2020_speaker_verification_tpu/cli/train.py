"""Train a speaker-embedding model.

Replaces the reference's recipe shell + mpirun launcher + tf_train_tdnn.py
(/root/reference/tensorflow/run_tf_train_local.sh:21-101, tf_train_tdnn.py:67-320)
with one CLI over the recipe registry:

    python -m voxsrc2020_speaker_verification_tpu.cli.train \
        --recipe res2net_vox2_dev_aug --model res2net50_w24_s4_c32 \
        --data-root ../data

    # LMFT finetune (auto-resumes from the pretrain experiment dir):
    python -m voxsrc2020_speaker_verification_tpu.cli.train \
        --recipe res2net_finetune_vox2_dev --model res2net50_w24_s4_c32 \
        --data-root ../data

    # throughput check without data (ref get_batch_synthetic,
    # tf_train_tdnn.py:59-64):
    python -m voxsrc2020_speaker_verification_tpu.cli.train \
        --recipe res2net_vox2_dev_aug --synthetic --max-steps 50

Multi-host: run once per host with --coordinator/--process-id/--num-processes
(jax.distributed); each host feeds its own contiguous block of scp shards
(ref tf_train_tdnn.py:155-164).
"""

from __future__ import annotations

import argparse
import dataclasses
import os

from ..recipes import RECIPES, get_recipe


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__,
                                formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("--recipe", required=True, choices=sorted(RECIPES))
    p.add_argument("--model", default=None, help="model id override")
    p.add_argument("--data-root", default="data")
    p.add_argument("--exp-root", default="exp")
    p.add_argument("--num-shards", type=int, default=32,
                   help="which {N}-split scp sharding to read")
    p.add_argument("--synthetic", action="store_true",
                   help="random data, no IO (throughput benchmarking)")
    p.add_argument("--raw", action="store_true",
                   help="raw-audio mode: stream wav.scp (specs rendered "
                        "online), FBANK+CMVN on device -- no feature store")
    p.add_argument("--num-workers", type=int, default=None,
                   help="feeder threads (raw/feature modes); default "
                        "min(4, host cores) -- a fixed count would "
                        "oversubscribe small hosts, starving the XLA "
                        "dispatch threads the jitted step runs on")
    p.add_argument("--no-native-feeder", action="store_true",
                   help="force the Python feeder even when the C++ one "
                        "(native/vox_feeder.cc) is built")
    p.add_argument("--max-steps", type=int, default=None)
    p.add_argument("--log-every", type=int, default=100)
    p.add_argument("--no-checkpoint", action="store_true")
    p.add_argument("--save-every-steps", type=int, default=None,
                   help="mid-epoch checkpoint cadence (preemption safety; "
                        "per-epoch checkpoints always happen)")
    p.add_argument("--specaug", action="store_true")
    p.add_argument("--cmvn-pkl", default=None,
                   help="global CMVN (mean, std) pickle applied after "
                        "sliding CMN (ref tf_train_tdnn.py:91 cmvn_pkl)")
    p.add_argument("--num-model-shards", type=int, default=1)
    p.add_argument("--seed", type=int, default=0)
    # config overrides
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--num-accumulation-steps", type=int, default=None)
    p.add_argument("--total-epochs", type=int, default=None)
    p.add_argument("--margin", type=float, default=None)
    p.add_argument("--scale", type=float, default=None)
    p.add_argument("--feat-length", type=int, default=None)
    p.add_argument("--base-lr", type=float, default=None)
    p.add_argument("--remat", action="store_true", default=None,
                   help="per-block rematerialization (large models/batches "
                        "that exceed HBM; see PERF.md for measured shapes)")
    p.add_argument("--remat-stages", type=int, nargs="+", default=None,
                   help="with --remat: apply only to these 0-based res2net "
                        "stages (PERF.md: (0,1,2) is the best f600 shape)")
    p.add_argument("--remat-policy", default=None,
                   help="jax.checkpoint_policies name for selective remat")
    p.add_argument("--single-chip", action="store_true",
                   help="apply the measured-best single-v5e shape for the "
                        "recipe model (batch/accum/remat from PERF.md "
                        "sweeps; recipes default to the reference's "
                        "global-batch shape for BN parity)")
    p.add_argument("--dataset", default=None,
                   help="data dir name override (also sets num_classes/"
                        "dataset_length from the dir when they differ)")
    p.add_argument("--num-classes", type=int, default=None)
    p.add_argument("--dataset-length", type=int, default=None)
    # multi-host bootstrap (jax.distributed; ref: mpirun + hvd.init)
    p.add_argument("--coordinator", default=None,
                   help="host:port of process 0; enables jax.distributed")
    p.add_argument("--process-id", type=int, default=0)
    p.add_argument("--num-processes", type=int, default=1)
    return p


def resolve_num_workers(requested, cores=None):
    """--num-workers default: min(4, host cores), floor 1.  A fixed 4 on a
    2-core host oversubscribes the XLA dispatch threads the jitted step
    runs on; explicit user values pass through untouched.  Re-exported from
    utils for library callers (the native feeders default through it too)."""
    from ..utils import resolve_num_workers as _resolve
    return _resolve(requested, cores)


def main(argv=None) -> None:
    p = build_parser()
    args = p.parse_args(argv)
    if args.num_workers is None and args.num_processes > 1:
        # multi-host: the raw Python fallback derives its GLOBAL sharding
        # (num_shards = num_processes * workers) from this value, so a
        # host-cores-dependent default would let heterogeneous hosts
        # disagree on num_shards and double-read/skip utterances.  Pin the
        # cross-host default; single-host keeps the core-adaptive one.
        args.num_workers = 4
    args.num_workers = resolve_num_workers(args.num_workers)
    if args.num_workers < 1:
        p.error("--num-workers must be >= 1")
    if args.cmvn_pkl and (args.raw or args.synthetic):
        p.error("--cmvn-pkl applies to the precomputed-feature path only "
                "(the raw path normalizes on device, ops/pipeline.py)")

    if args.coordinator:
        import jax
        jax.distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )

    overrides = {
        k: v for k, v in {
            "batch_size": args.batch_size,
            "num_accumulation_steps": args.num_accumulation_steps,
            "total_epochs": args.total_epochs,
            "margin": args.margin,
            "scale": args.scale,
            "feat_length": args.feat_length,
            "base_lr": args.base_lr,
            "dataset": args.dataset,
            "num_classes": args.num_classes,
            "dataset_length": args.dataset_length,
            # --remat-stages/--remat-policy imply --remat: the model only
            # checkpoints when remat is set, so a bare --remat-stages would
            # otherwise be a silent no-op
            "remat": (args.remat or args.remat_stages is not None
                      or args.remat_policy is not None) or None,
            "remat_stages": (tuple(args.remat_stages)
                             if args.remat_stages is not None else None),
            "remat_policy": args.remat_policy,
        }.items() if v is not None
    }
    overrides.update(
        exp_root=args.exp_root, seed=args.seed,
        specaug=args.specaug, num_model_shards=args.num_model_shards,
        raw_audio=args.raw,
    )
    config, resume_from = get_recipe(args.recipe, model=args.model,
                                     single_chip=args.single_chip, **overrides)
    if resume_from is not None:
        resume_from = os.path.join(args.exp_root, *resume_from.split("/")[1:]) \
            if resume_from.startswith("exp/") else resume_from

    from ..data import BatchFeeder, FeatureShardDataset, SyntheticDataset
    from ..data.dataset import shard_paths_for_host
    from ..training.loop import fit
    from ..utils.datadir import load_utt2id

    if args.synthetic:
        sources = [SyntheticDataset(config.feat_dim, config.feat_length,
                                    config.num_classes, seed=i)
                   for i in range(4)]
    elif args.raw:
        from ..data import native as native_mod
        from ..ops.fbank import FbankConfig
        data_dir = os.path.join(args.data_root, config.dataset)
        utt2id = load_utt2id(os.path.join(data_dir, "utt2id.pkl"))
        w = args.num_workers
        use_native_raw = (
            not args.no_native_feeder and native_mod.available()
            and hasattr(native_mod.get_lib(), "vox_raw_feeder_create")
        )
        if not use_native_raw:
            from ..data.raw_dataset import RawAudioShardDataset
            sources = [
                RawAudioShardDataset(
                    os.path.join(data_dir, "wav.scp"), utt2id,
                    config.feat_length,
                    cfg=FbankConfig(num_bins=config.feat_dim),
                    context=config.cmn_context,
                    shard_index=args.process_id * w + i,
                    num_shards=args.num_processes * w,
                    seed=args.seed + 1000 * args.process_id + i,
                )
                for i in range(w)
            ]
    else:
        from ..data import native as native_mod
        data_dir = os.path.join(args.data_root, config.dataset)
        utt2id = load_utt2id(os.path.join(data_dir, "utt2id.pkl"))
        paths = shard_paths_for_host(
            data_dir, args.num_shards, args.process_id, args.num_processes
        )
        use_native = (
            not args.no_native_feeder and native_mod.available()
            and hasattr(native_mod.get_lib(), "vox_feeder_create")
        )
        if not use_native:
            sources = [
                FeatureShardDataset(
                    p, utt2id, config.feat_dim, config.feat_length,
                    cmvn_pkl=args.cmvn_pkl,
                    seed=args.seed + 1000 * args.process_id + i,
                )
                for i, p in enumerate(paths)
            ]

    # each process feeds its local slice of the global per-microbatch batch
    assert config.batch_size % args.num_processes == 0
    local_batch = config.batch_size // args.num_processes
    if args.raw and use_native_raw:
        # whole raw hot loop (wav decode + online aug render + int16 crop +
        # assembly) in the C++ thread pool (native/vox_raw.cc); this host
        # shards the wav.scp by process id
        feeder = native_mod.NativeRawBatchFeeder(
            os.path.join(data_dir, "wav.scp"), utt2id, config.feat_length,
            local_batch, config.num_accumulation_steps,
            cfg=FbankConfig(num_bins=config.feat_dim),
            context=config.cmn_context,
            num_threads=args.num_workers,
            seed=args.seed + 1000 * args.process_id,
            shard_index=args.process_id, num_shards=args.num_processes,
        ).start()
    elif not args.synthetic and not args.raw and use_native:
        # whole hot loop (ark decode + CMN + crop + assembly + bf16 wire)
        # in the C++ thread pool, one ctypes call per optimizer step
        # (native/vox_feeder.cc)
        feeder = native_mod.NativeBatchFeeder(
            paths, utt2id, config.feat_dim, config.feat_length,
            local_batch, config.num_accumulation_steps,
            num_threads=args.num_workers,
            seed=args.seed + 1000 * args.process_id,
            wire_bf16=config.bf16,
            cmvn_pkl=args.cmvn_pkl,
        ).start()
    else:
        feeder = BatchFeeder(
            sources, local_batch, config.num_accumulation_steps,
            # bf16 compute -> bf16 wire is lossless and halves the transfer
            wire_bf16=config.bf16 and not args.raw and not args.synthetic,
        ).start()
    try:
        result = fit(
            config, feeder,
            resume_from=resume_from,
            log_every=args.log_every,
            max_steps=args.max_steps,
            checkpoint=not args.no_checkpoint,
            save_every_steps=args.save_every_steps,
        )
        if result.preempted:
            print(f"preempted at step {int(result.state.step)} "
                  "(checkpoint saved)")
        print(f"done: {result.steps_run} steps, "
              f"{result.audio_seconds_per_second:.0f} audio-s/s")
    finally:
        feeder.stop()


if __name__ == "__main__":
    main()
