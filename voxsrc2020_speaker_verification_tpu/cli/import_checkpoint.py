"""Migrate a reference TensorFlow-1.x checkpoint into a framework
experiment directory.

The reference publishes trained checkpoints (ref README.md:131,164, e.g.
``res2net50_w24_s4_c32_..._8GPUs_5994_122636``); this converts one into an
orbax TrainState checkpoint that every framework surface consumes -- resume
training (cli.train auto-resumes from the experiment dir, incl. the LMFT
leg), export (cli.export), extraction (cli.extract), serving (cli.serve):

    python -m voxsrc2020_speaker_verification_tpu.cli.import_checkpoint \
        --ckpt /path/to/model.ckpt-122636 \
        --model res2net50_w24_s4_c32 --projection sc_cm_linear \
        --num-classes 5994 --exp-dir exp/voxceleb2_dev_aug/<name>

The variable-name mapping (TF1 auto-uniquified scopes -> flax paths) is
utils/tf_import.py, proven against reference-trained oracles for all four
model families (tests/test_tf_import.py).  Also accepts an .npz of
``{tf_var_name: array}`` (the oracle dump format) via --npz, so migrations
can be tested without TensorFlow installed.

Momentum slots: ``<var>/Momentum`` slots present in the checkpoint are
imported so a resumed run continues the optimizer trace; otherwise momentum
starts at zero (correct for inference / LMFT-style fresh legs).
"""

from __future__ import annotations

import argparse

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__,
                                formatter_class=argparse.RawDescriptionHelpFormatter)
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--ckpt", help="TF checkpoint prefix (reads via "
                                    "tf.train.load_checkpoint; needs TF)")
    src.add_argument("--npz", help="npz of {tf_var_name: array} (no TF "
                                   "needed; oracle-dump format)")
    p.add_argument("--model", required=True)
    p.add_argument("--projection", default="sc_cm_linear")
    p.add_argument("--num-classes", type=int, default=5994)
    p.add_argument("--num-centers", type=int, default=2)
    p.add_argument("--exp-dir", required=True,
                   help="output experiment dir (orbax checkpoint lands here)")
    p.add_argument("--step", type=int, default=None,
                   help="global step to record; default: the checkpoint's "
                        "global_step variable (the LMFT resume trick keys "
                        "schedules off this -- ref tf_scheduler.py:72-73)")
    p.add_argument("--recipe", default=None,
                   help="recipe to derive <exp-dir>/config.json from (so "
                        "cli.export/evaluate need no extra flags); without "
                        "it a config with the given model/projection/"
                        "num-classes and framework defaults is written")
    p.add_argument("--feat-dim", type=int, default=None,
                   help="feature dimensionality for the written config.json "
                        "(default: the recipe's value, or 80 without "
                        "--recipe); MUST match what the checkpoint was "
                        "trained on -- nothing downstream can detect a "
                        "mismatch (res2net param shapes are feat_dim-"
                        "independent)")
    return p


def load_snapshot(args) -> dict:
    if args.npz:
        data = np.load(args.npz)
        return {k: data[k] for k in data.files}
    from ..utils.tf_import import load_tf_checkpoint
    return load_tf_checkpoint(args.ckpt)


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    snapshot = load_snapshot(args)

    import jax
    import jax.numpy as jnp

    from ..training.checkpoint import CheckpointManager
    from ..training.trainer import TrainState
    from ..utils.tf_import import import_reference_weights

    params, batch_stats = import_reference_weights(
        snapshot, args.model, projection_id=args.projection)

    # Momentum slots, when the checkpoint carries them: "<var>/Momentum"
    # in a real TF checkpoint, "<var>/Momentum:0" in oracle npz dumps.
    slots = {}
    for k, v in snapshot.items():
        if k.endswith("/Momentum"):
            slots[k[: -len("/Momentum")]] = v
        elif k.endswith("/Momentum:0"):
            slots[k[: -len("/Momentum:0")] + ":0"] = v
    if slots:
        momentum, _ = import_reference_weights(
            slots, args.model, projection_id=args.projection,
            params_only=True)
    else:
        momentum = jax.tree.map(
            lambda p: np.zeros(np.shape(p), np.float32), params)

    step = args.step
    if step is None:
        for key in ("global_step", "global_step:0"):
            if key in snapshot:
                step = int(np.asarray(snapshot[key]))
                break
    if step is None:
        step = 0

    state = TrainState(
        step=jnp.asarray(step, jnp.int32),
        params=jax.tree.map(jnp.asarray, params),
        batch_stats=jax.tree.map(jnp.asarray, batch_stats),
        momentum=jax.tree.map(
            lambda p: jnp.asarray(p, jnp.float32), momentum),
    )
    n_params = sum(int(np.prod(np.shape(p)))
                   for p in jax.tree.leaves(params))
    mgr = CheckpointManager(args.exp_dir)
    mgr.save(state, step=step)
    mgr.close()

    # config.json makes the dir self-describing for cli.export / evaluate /
    # serve (they read it instead of re-asking for model/projection flags).
    import dataclasses
    import os

    if args.recipe:
        from ..recipes import get_recipe
        config, _ = get_recipe(args.recipe, model=args.model)
        config = dataclasses.replace(
            config, projection=args.projection, num_classes=args.num_classes,
            num_centers=args.num_centers,
            **({"feat_dim": args.feat_dim}
               if args.feat_dim is not None else {}))
    else:
        from ..training.config import TrainConfig
        config = TrainConfig(
            model=args.model, projection=args.projection,
            num_classes=args.num_classes, num_centers=args.num_centers,
            feat_dim=args.feat_dim if args.feat_dim is not None else 80)
    config.to_json(os.path.join(args.exp_dir, "config.json"))
    print(f"imported {args.model} ({n_params / 1e6:.1f}M params, "
          f"{'with' if slots else 'zero'} momentum) at step {step} "
          f"-> {args.exp_dir}")


if __name__ == "__main__":
    main()
