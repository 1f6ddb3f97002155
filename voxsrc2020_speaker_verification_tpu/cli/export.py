"""Export a trained checkpoint to an inference artifact.

Replaces the reference's export_inference_model.sh (graph_eval.pbtxt +
freeze_graph + projection-weight pickle, :29-49):

    python -m voxsrc2020_speaker_verification_tpu.cli.export \
        --recipe res2net_vox2_dev_aug --model res2net50_w24_s4_c32 \
        --exp-dir exp/voxceleb2_dev_aug/... --out exp/.../artifact

Writes variables (orbax), config.json, projection_weight.pkl (cohort rows,
ref export_projection_weight.py) and optional StableHLO embed functions
(--stablehlo) for model-code-free serving.
"""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__,
                                formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("--recipe", default=None,
                   help="recipe name; not needed when <exp-dir>/config.json "
                        "exists (written by training)")
    p.add_argument("--model", default=None)
    p.add_argument("--exp-dir", default=None,
                   help="experiment dir (default: the recipe's exp_dir)")
    p.add_argument("--step", type=int, default=None,
                   help="checkpoint step (default latest)")
    p.add_argument("--out", default=None, help="artifact dir (default <exp>/artifact)")
    p.add_argument("--stablehlo", action="store_true",
                   help="also serialize StableHLO embed fns per bucket")
    p.add_argument("--batch-size", type=int, default=32)
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)

    import jax

    from ..eval.export import export_inference_artifact
    from ..recipes import get_recipe
    from ..training import create_train_state
    from ..training.checkpoint import CheckpointManager

    import os

    from ..training.config import TrainConfig

    config = None
    if args.recipe:
        config, _ = get_recipe(args.recipe, model=args.model)
    exp_dir = args.exp_dir or (config.exp_dir if config else None)
    assert exp_dir, "--exp-dir or --recipe required"
    # the exp dir's own config (written by training) wins: it carries any
    # CLI overrides the recipe preset doesn't know about
    cfg_json = os.path.join(exp_dir, "config.json")
    if os.path.exists(cfg_json):
        config = TrainConfig.from_json(cfg_json)
    assert config is not None, f"no {cfg_json}; pass --recipe"
    out = args.out or f"{exp_dir}/artifact"

    state = create_train_state(config, jax.random.PRNGKey(0))
    mgr = CheckpointManager(exp_dir)
    restored = mgr.restore(state, step=args.step)
    mgr.close()
    assert restored is not None, f"no checkpoint in {exp_dir}"

    buckets = ()
    if args.stablehlo:
        buckets = tuple((args.batch_size, t) for t in (256, 512, 1000))
    path = export_inference_artifact(config, restored, out,
                                     stablehlo_buckets=buckets)
    print(f"artifact at {path} (step {int(restored.step)})")


if __name__ == "__main__":
    main()
