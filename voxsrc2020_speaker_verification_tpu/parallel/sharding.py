"""Device mesh + sharding rules.

Replaces the reference's Horovod/OpenMPI data-parallel layer
(/root/reference/tensorflow/run_tf_train_local.sh:72-75, tf_train_tdnn.py:250-252)
with a `jax.sharding.Mesh` and GSPMD:

* axis ``data``  -- batch sharding; gradient averaging becomes the psum GSPMD
  inserts for the replicated-param gradient, riding ICI instead of NCCL rings.
* axis ``model`` -- the margin-softmax classifier kernel [K, emb, classes] is
  sharded over its class axis (the reference replicates this 5994-class
  projection; at TPU scale sharding it removes the largest replicated matmul
  and turns the softmax normalizer into a single small psum).

Everything else (the CNN trunk, a few M params) is replicated: its per-step
gradient allreduce is tiny compared to activations, exactly like the
reference's fp16 allreduce of accumulated gradients.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

MESH_DATA = "data"
MESH_MODEL = "model"


def make_mesh(
    num_data: Optional[int] = None,
    num_model: int = 1,
    devices=None,
) -> Mesh:
    """Build a (data, model) mesh over the available devices."""
    devices = jax.devices() if devices is None else devices
    n = len(devices)
    if num_data is None:
        num_data = n // num_model
    assert num_data * num_model == n, (num_data, num_model, n)
    arr = np.asarray(devices).reshape(num_data, num_model)
    return Mesh(arr, (MESH_DATA, MESH_MODEL))


def _is_projection_kernel(path) -> bool:
    keys = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
    return "projection" in keys


def param_shardings(mesh: Mesh, variables_shape: Any) -> Any:
    """PartitionSpec tree for a variables pytree (params + batch_stats + opt).

    The projection kernel shards its class (last) axis over ``model``; all
    other leaves are replicated.  Works on shapes from jax.eval_shape.
    """

    def spec_for(path, leaf) -> NamedSharding:
        if _is_projection_kernel(path):
            ndim = len(leaf.shape)
            spec = P(*([None] * (ndim - 1) + [MESH_MODEL]))
        else:
            spec = P()
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(spec_for, variables_shape)


def batch_spec(accum_axis: bool = True) -> P:
    """Batch sharding: leading accumulation axis replicated (scanned), batch
    axis sharded over ``data``."""
    return P(None, MESH_DATA) if accum_axis else P(MESH_DATA)
