"""Device mesh construction and sharding rules.

The reference is single-process single-GPU (``Train.py:27-35``); scaling
here is SPMD over a ``jax.sharding.Mesh``: the batch is sharded over the
``data`` axis, parameters and optimizer state are replicated, and XLA
inserts the gradient ``psum`` over ICI automatically when the jitted train
step consumes sharded batches.  A ``model`` axis is part of the mesh layout
for tensor-parallel growth (unused at this model scale — ~30 M params).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from glow_tts_tpu.config import Config


def make_mesh(config: Config,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    model = max(config.tpu.model_parallel, 1)
    data = config.tpu.data_parallel or (len(devices) // model)
    if data * model > len(devices):
        raise ValueError(
            f'mesh {data}×{model} needs {data * model} devices, '
            f'have {len(devices)}')
    grid = np.asarray(devices[:data * model]).reshape(data, model)
    return Mesh(grid, config.tpu.mesh_axes)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis over the data axis (per-device micro-batches)."""
    return NamedSharding(mesh, P('data'))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host batch dict onto the mesh, sharded over 'data'.

    Single-process: a plain device_put scatter.  Multi-process (one host
    per slice over DCN): each host passes its *local* shard and jax
    assembles the global array — use :func:`shard_host_local_batch`.
    """
    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch)


def shard_host_local_batch(mesh: Mesh, local_batch):
    """Multi-host path: every process contributes its per-host shard of the
    global batch (global batch = local batch × process_count along axis 0).
    jax stitches them into one global array without gathering over DCN."""
    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sharding, x),
        local_batch)
