"""Training loop orchestration: mesh + shardings + feeder + jitted step +
per-epoch checkpoints + metric logging.

Replaces the reference's MonitoredTrainingSession hot loop
(/root/reference/tensorflow/tf_train_tdnn.py:296-317):

* LoggingTensorHook every N optimizer steps -> `log_every` prints of
  step/loss/reg-loss/accuracy/lr/margin (+ audio-s/s, the BASELINE metric)
* StopAtStepHook(total_steps)              -> loop bound
* per-epoch rank-0 checkpoints + resume    -> orbax CheckpointManager
* feed_dict queue.get                      -> BatchFeeder (host threads) with
  a single device_put of the whole (A, B, T, F) optimizer-step batch

One jit-compiled function per optimizer step; donated state, sharded batch.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Iterable, Optional

import jax
import numpy as np
from jax.sharding import NamedSharding

from ..parallel.sharding import batch_spec, make_mesh, param_shardings
from .checkpoint import restore_or_init
from .config import TrainConfig
from .trainer import TrainState, create_train_state, make_train_step


@dataclasses.dataclass
class FitResult:
    state: TrainState
    steps_run: int
    audio_seconds_per_second: float
    preempted: bool = False


class _PrefetchError:
    def __init__(self, exc: BaseException):
        self.exc = exc


def device_prefetch(iterator, put, depth: int = 2):
    """Double-buffered device feed: a background thread runs ``put`` (the
    host->device transfer) up to ``depth`` batches ahead, so the copy
    overlaps the running step instead of serializing with dispatch.  The
    reference gets the same overlap from its feeder-process queue + TF's
    async feed_dict staging (tf_train_tdnn.py:151-164,313-317); over a
    remote-TPU tunnel the transfer is expensive enough that this matters
    even more than on local PCIe."""
    import queue
    import threading

    buf: "queue.Queue" = queue.Queue(maxsize=depth)
    done = object()

    def worker():
        try:
            for item in iterator:
                buf.put(put(item))
        except BaseException as e:  # surface in the consumer thread
            buf.put(_PrefetchError(e))
            return
        buf.put(done)

    threading.Thread(target=worker, daemon=True).start()
    while True:
        item = buf.get()
        if item is done:
            return
        if isinstance(item, _PrefetchError):
            raise item.exc
        yield item


def fit(
    config: TrainConfig,
    batches: Iterable,
    exp_dir: Optional[str] = None,
    resume_from: Optional[str] = None,
    log_every: int = 100,
    log_fn: Callable[[str], None] = print,
    max_steps: Optional[int] = None,
    checkpoint: bool = True,
    mesh=None,
    save_every_steps: Optional[int] = None,
    handle_preemption: bool = True,
) -> FitResult:
    """Train until `config.total_steps` (or `max_steps` more steps).

    batches: iterable of (feats (A, B, T, F) np.float32, labels (A, B) np.int32)
             -- e.g. a started BatchFeeder.

    Preemption safety (TPU pods preempt; the reference only checkpoints per
    epoch, tf_train_tdnn.py:311): `save_every_steps` adds mid-epoch
    checkpoints, and -- when checkpointing is on and we're on the main
    thread -- SIGTERM triggers a final checkpoint + clean return with
    ``FitResult.preempted=True`` instead of losing the epoch.
    """
    exp_dir = exp_dir or config.exp_dir
    if mesh is None:
        import math
        n = jax.device_count()
        num_model = config.num_model_shards
        # data axis must divide the per-microbatch size; drop devices if not
        num_data = math.gcd(n // num_model, config.batch_size)
        devices = jax.devices()[: num_data * num_model]
        mesh = make_mesh(num_data=num_data, num_model=num_model, devices=devices)

    state = create_train_state(config, jax.random.PRNGKey(config.seed))
    state_shardings = param_shardings(mesh, jax.eval_shape(lambda: state))
    state = jax.device_put(state, state_shardings)

    mgr = None
    metrics_writer = None
    if checkpoint:
        import os

        from ..utils.observability import MetricsWriter
        os.makedirs(exp_dir, exist_ok=True)
        config.to_json(os.path.join(exp_dir, "config.json"))
        metrics_writer = MetricsWriter(exp_dir)
        state, mgr = restore_or_init(
            state, exp_dir, resume_from=resume_from,
            max_to_keep=config.total_epochs + 1,
        )
    elif resume_from is not None:
        # checkpoint saving disabled but a resume source given (e.g. LMFT
        # smoke runs with --no-checkpoint): still restore -- silently
        # training from random init would be a wrong run, not a fast one.
        from .checkpoint import CheckpointManager
        src = CheckpointManager(resume_from)
        restored = src.restore(state)
        src.close()
        if restored is not None:
            state = restored

    data_sharding = NamedSharding(mesh, batch_spec())
    step_fn = jax.jit(
        make_train_step(config),
        in_shardings=(state_shardings, data_sharding, data_sharding, None),
        out_shardings=(state_shardings, None),
        donate_argnums=0,
    )
    rng = jax.random.PRNGKey(config.seed + 1)

    start_step = int(state.step)
    stop_step = config.total_steps
    if max_steps is not None:
        stop_step = min(stop_step, start_step + max_steps)
    epoch_size = config.epoch_size
    audio_s_per_step = config.effective_batch * config.feat_length / 100.0

    # Multi-host: every process feeds its LOCAL shard of the batch
    # (batch_size // process_count per microbatch); assemble the global
    # jax.Array across hosts before the jitted call.
    num_procs = jax.process_count()

    def globalize(batch):
        feats, labels = batch
        if num_procs == 1:
            # Explicit async transfer (instead of implicit put at dispatch)
            # so device_prefetch overlaps it with the previous step.
            feats = jax.device_put(feats, data_sharding)
            labels = jax.device_put(np.asarray(labels), data_sharding)
            return feats, labels
        feats = jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                data_sharding, np.asarray(x)), feats)
        labels = jax.make_array_from_process_local_data(
            data_sharding, np.asarray(labels))
        return feats, labels

    import signal
    import threading

    preempt = threading.Event()
    prev_handler = None
    trap_sigterm = (handle_preemption and mgr is not None
                    and threading.current_thread() is threading.main_thread())
    if trap_sigterm:
        prev_handler = signal.signal(
            signal.SIGTERM, lambda _sig, _frame: preempt.set())

    it = device_prefetch(iter(batches), globalize, depth=2)
    pending_metrics = None
    t_log = time.perf_counter()
    t_start = t_log
    steps_run = 0
    cur = start_step
    try:
        while cur < stop_step and not preempt.is_set():
            feats, labels = next(it)
            state, metrics = step_fn(state, feats, labels, rng)
            cur += 1
            steps_run += 1
            pending_metrics = metrics

            if log_every and (cur % log_every == 0 or cur == stop_step):
                m = {k: float(v) for k, v in jax.device_get(metrics).items()}
                now = time.perf_counter()
                done = log_every if cur % log_every == 0 else cur % log_every
                rate = done / (now - t_log) * audio_s_per_step
                t_log = now
                # Feeder health (native C++ feeder, data/native.py): a shard
                # that decodes nothing over a full pass is silent data loss
                # -- fail loudly instead of training on a partial dataset.
                errs = (batches.decode_errors()
                        if hasattr(batches, "decode_errors") else 0)
                log_fn(
                    f"step {cur}/{stop_step} loss {m['loss']:.4f} "
                    f"(ce {m['classification_loss']:.4f} reg {m['regularization_loss']:.4f}) "
                    f"acc {m['accuracy']:.4f} lr {m['learning_rate']:.6f} "
                    f"margin {m['margin']:.4f} gnorm {m['gradient_norm']:.2f} "
                    f"audio-s/s {rate:.0f}"
                    + (f" decode-errors {errs}" if errs else "")
                )
                if metrics_writer is not None:
                    metrics_writer.write(
                        cur, m, audio_s_per_s=rate,
                        **({"decode_errors": errs} if errs else {}))
            # Feeder dead-shard check on its OWN cadence: it must fire even
            # with logging disabled (log_every=0), or a corrupt shard would
            # silently shrink the training set exactly when nobody watches.
            if (cur % (log_every or 100) == 0
                    and hasattr(batches, "dead_shards")):
                dead = batches.dead_shards()
                if dead:
                    errs = (batches.decode_errors()
                            if hasattr(batches, "decode_errors") else 0)
                    raise IOError(
                        f"{dead} feeder shard(s) decoded nothing over a "
                        f"full pass ({errs} decode errors): part of the "
                        f"dataset is missing -- corrupt ark or feat-dim "
                        f"mismatch; refusing to keep training")
            if mgr is not None and (
                    cur % epoch_size == 0
                    or (save_every_steps and cur % save_every_steps == 0)):
                mgr.save(state, step=cur)
    finally:
        # always restore the previous SIGTERM disposition: leaking the
        # handler past an exception would make a supervisor's polite kill
        # set a dead Event instead of terminating the process
        if trap_sigterm:
            signal.signal(signal.SIGTERM, prev_handler)

    if pending_metrics is not None:
        jax.block_until_ready(pending_metrics)
    elapsed = time.perf_counter() - t_start
    if preempt.is_set():
        log_fn(f"SIGTERM at step {cur}: checkpointing and exiting")
    if mgr is not None:
        if steps_run and (cur % epoch_size != 0 or preempt.is_set()):
            mgr.save(state, step=cur)
        mgr.close()
    if metrics_writer is not None:
        metrics_writer.close()
    return FitResult(
        state=state,
        steps_run=steps_run,
        audio_seconds_per_second=steps_run * audio_s_per_step / max(elapsed, 1e-9),
        preempted=preempt.is_set(),
    )
