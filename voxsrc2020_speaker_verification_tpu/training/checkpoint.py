"""Checkpoint / resume.

Reference contract (/root/reference/tensorflow/tf_train_tdnn.py:296-317):

* one checkpoint per epoch (``save_checkpoint_steps=EPOCH_SIZE``), keeping
  ``NUM_EPOCHS + 1`` checkpoints (tf.train.Saver max_to_keep, :305)
* auto-resume: restore the latest checkpoint in the experiment dir or
  initialize fresh (MonitoredTrainingSession semantics, :304-311)
* **the schedule is keyed off the restored global step** -- the LMFT recipe
  relies on this: it reuses the pretrain experiment dir (reference symlinks
  it, run_res2net_finetune_local_vox2_dev.sh:51) so the restored step lands
  in the x1/128 learning-rate tail while margin/frames change.  Here that is
  `resume_from=<pretrain exp dir>`: the pretrain state (including step) is
  restored into the new experiment dir.

TPU-native: orbax-checkpoint with a PyTree handler; restore takes an
abstract target built with jax.eval_shape so sharded/device placement is
driven by the caller's shardings.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

from .trainer import TrainState


class CheckpointManager:
    """Per-epoch checkpoints of a TrainState, newest-kept policy."""

    def __init__(self, directory: str, max_to_keep: Optional[int] = None):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                create=True,
                enable_async_checkpointing=True,
            ),
        )

    def save(self, state: TrainState, step: Optional[int] = None) -> None:
        step = int(state.step) if step is None else int(step)
        if step in self._mgr.all_steps():
            return  # already checkpointed (e.g. SIGTERM on an epoch boundary)
        self._mgr.save(step, args=ocp.args.StandardSave(state))

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(
        self, target: TrainState, step: Optional[int] = None
    ) -> Optional[TrainState]:
        """Restore into the structure/shardings of `target` (a concrete or
        abstract TrainState). Returns None when no checkpoint exists."""
        step = self.latest_step() if step is None else step
        if step is None:
            return None
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(
                x.shape, x.dtype, sharding=getattr(x, "sharding", None)
            ),
            target,
        )
        return self._mgr.restore(step, args=ocp.args.StandardRestore(abstract))

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.wait_until_finished()
        self._mgr.close()


def restore_or_init(
    state: TrainState,
    exp_dir: str,
    resume_from: Optional[str] = None,
    max_to_keep: Optional[int] = None,
) -> tuple:
    """MonitoredTrainingSession-style bootstrap.

    1. latest checkpoint in `exp_dir` -> restore (normal auto-resume)
    2. else `resume_from` given -> restore ITS latest into `state`
       (LMFT: global step continues, schedules land in the finetune tail)
    3. else -> fresh `state`

    Returns (state, manager-for-exp_dir).
    """
    mgr = CheckpointManager(exp_dir, max_to_keep=max_to_keep)
    restored = mgr.restore(state)
    if restored is not None:
        return restored, mgr
    if resume_from is not None and os.path.isdir(resume_from):
        src = CheckpointManager(resume_from)
        restored = src.restore(state)
        src.close()
        if restored is not None:
            return restored, mgr
    return state, mgr
