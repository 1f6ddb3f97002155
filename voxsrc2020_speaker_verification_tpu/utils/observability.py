"""Observability: profiler traces, step timing, metrics persistence.

The reference's observability is a LoggingTensorHook + TF summaries
(tf_train_tdnn.py:266-298) and NCCL_DEBUG env (run_tf_train_local.sh:74).
Here:

* MetricsWriter -- append-only JSONL of per-log-step training metrics in the
  experiment dir (metrics.jsonl), the grep-able equivalent of the summary
  files; loadable with `load_metrics`.
* trace() -- context manager around jax.profiler for on-demand TPU traces
  (tensorboard-compatible artifacts in <exp>/profile).
* StepTimer -- wall-clock + audio-seconds/s counters (the BASELINE metric).
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Dict, Iterator, List, Optional


class MetricsWriter:
    def __init__(self, exp_dir: str, name: str = "metrics.jsonl"):
        os.makedirs(exp_dir, exist_ok=True)
        self.path = os.path.join(exp_dir, name)
        self._f = open(self.path, "a", buffering=1)

    def write(self, step: int, metrics: Dict[str, float], **extra) -> None:
        rec = {"step": int(step), "time": time.time(), **extra}
        rec.update({k: float(v) for k, v in metrics.items()})
        self._f.write(json.dumps(rec) + "\n")

    def close(self) -> None:
        self._f.close()


def load_metrics(exp_dir: str, name: str = "metrics.jsonl") -> List[Dict]:
    path = os.path.join(exp_dir, name)
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


@contextlib.contextmanager
def trace(exp_dir: str, enabled: bool = True) -> Iterator[None]:
    """jax.profiler trace scope; artifacts land in <exp_dir>/profile."""
    if not enabled:
        yield
        return
    import jax
    out = os.path.join(exp_dir, "profile")
    jax.profiler.start_trace(out)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Throughput counters: steps/s and audio-seconds/s since last lap."""

    def __init__(self, audio_seconds_per_step: float):
        self.audio_s = audio_seconds_per_step
        self._t = time.perf_counter()
        self._steps = 0

    def tick(self, n: int = 1) -> None:
        self._steps += n

    def lap(self) -> Dict[str, float]:
        now = time.perf_counter()
        dt = max(now - self._t, 1e-9)
        out = {
            "steps_per_s": self._steps / dt,
            "audio_s_per_s": self._steps * self.audio_s / dt,
        }
        self._t = now
        self._steps = 0
        return out
