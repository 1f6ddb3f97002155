"""Subprocess driver for the preemption test: fit() on synthetic data with
checkpointing; prints a PREEMPTED/COMPLETED marker line at the end."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

from voxsrc2020_speaker_verification_tpu.data import BatchFeeder, SyntheticDataset  # noqa: E402
from voxsrc2020_speaker_verification_tpu.training import TrainConfig  # noqa: E402
from voxsrc2020_speaker_verification_tpu.training.loop import fit  # noqa: E402


def main() -> None:
    exp_dir = sys.argv[1]
    save_every = int(sys.argv[2]) if len(sys.argv) > 2 else 0

    config = TrainConfig(
        model="tdnn", projection="sc_cm_linear", num_classes=5,
        dataset_length=160, feat_dim=40, feat_length=32,
        batch_size=4, num_accumulation_steps=1, total_epochs=2,
        bf16=False, exp_root="",
    )  # epoch_size 40, total 80 steps
    feeder = BatchFeeder(
        [SyntheticDataset(40, 32, 5, seed=0)], 4, 1).start()
    try:
        result = fit(
            config, feeder, exp_dir=exp_dir, log_every=2,
            log_fn=lambda s: print(s, flush=True),
            save_every_steps=save_every or None,
        )
    finally:
        feeder.stop()
    print(f"{'PREEMPTED' if result.preempted else 'COMPLETED'} "
          f"step={int(result.state.step)}", flush=True)


if __name__ == "__main__":
    main()
