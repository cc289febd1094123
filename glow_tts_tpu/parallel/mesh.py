"""Device mesh construction and sharding rules.

The reference is single-process single-GPU (``Train.py:27-35``); scaling
here is SPMD over a ``jax.sharding.Mesh``: the batch is sharded over the
``data`` axis, parameters and optimizer state are replicated, and XLA
inserts the gradient ``psum`` over ICI automatically when the jitted train
step consumes sharded batches.  A ``model`` axis is part of the mesh layout
for tensor-parallel growth (unused at this model scale — ~30 M params).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from glow_tts_tpu.config import Config


# Thin indirection so multi-host logic is testable on one machine (tests
# monkeypatch these to fake a pod).
def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def initialize_distributed() -> bool:
    """Env-gated ``jax.distributed.initialize`` for multi-host training.

    The reference is single-process (``Train.py:27-35``); on a TPU pod slice
    every host runs this same program and jax auto-detects the coordinator.
    Opt-in via ``GLOWTTS_MULTIHOST=1`` (optionally with explicit
    ``GLOWTTS_COORDINATOR`` / ``GLOWTTS_NUM_PROCESSES`` /
    ``GLOWTTS_PROCESS_ID`` for non-TPU clusters).  Returns True when running
    multi-process afterwards.
    """
    if os.environ.get('GLOWTTS_MULTIHOST', '') not in ('1', 'true', 'True'):
        return jax.process_count() > 1
    coordinator = os.environ.get('GLOWTTS_COORDINATOR')
    kwargs = {}
    if coordinator:
        kwargs = {
            'coordinator_address': coordinator,
            'num_processes': int(os.environ['GLOWTTS_NUM_PROCESSES']),
            'process_id': int(os.environ['GLOWTTS_PROCESS_ID']),
        }
    jax.distributed.initialize(**kwargs)
    return jax.process_count() > 1


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


def local_batch_view(x) -> np.ndarray:
    """Host view of the process-local rows of a (possibly multi-host
    sharded) array.  Fully-addressable arrays (single process, or
    replicated) come back whole; on a pod a batch-sharded array comes back
    as this process's contiguous slice."""
    if not isinstance(x, jax.Array):
        return np.asarray(x)
    if x.is_fully_addressable:
        return np.asarray(x)
    seen = {}
    for shard in x.addressable_shards:
        key = tuple((sl.start or 0, sl.stop) for sl in shard.index)
        seen.setdefault(key, shard.data)
    ordered = sorted(seen.items(), key=lambda kv: kv[0][0][0])
    return np.concatenate([np.asarray(d) for _, d in ordered], axis=0)


def replicate_host_local_batch(mesh: Mesh, local_batch):
    """Multi-host path for *identical* per-host data (fixed inference
    sentences, prosody-check batches): every process passes the same local
    array, which IS the global value under a replicated sharding — no DCN
    gather needed."""
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sharding, x),
        local_batch)


# ---------------------------------------------------------------------------
# Ambient mesh for batch-parallel Pallas ops
#
# Pallas custom-calls are opaque to GSPMD: under a jitted step consuming
# batch-sharded arrays, XLA would all-gather their operands onto every
# device instead of partitioning them.  Batch-parallel kernels (MAS,
# the fused coupling) therefore consult the *ambient* mesh — set by the
# trainer around its jitted step calls — and wrap themselves in
# ``jax.shard_map`` over the 'data' axis, so each device runs the kernel
# on its own micro-batch.  No mesh active (single chip, bench, examples)
# → the ops run unwrapped, exactly as before.

import contextlib as _contextlib
import contextvars as _contextvars

_ACTIVE_MESH: "_contextvars.ContextVar[Optional[Mesh]]" = \
    _contextvars.ContextVar('glow_tts_active_mesh', default=None)


@_contextlib.contextmanager
def activate_mesh(mesh: Optional[Mesh]):
    """Make ``mesh`` visible to batch-parallel Pallas ops during tracing."""
    token = _ACTIVE_MESH.set(mesh)
    try:
        yield
    finally:
        _ACTIVE_MESH.reset(token)


def active_data_mesh(batch_size: Optional[int] = None) -> Optional[Mesh]:
    """The ambient mesh, iff it has a >1 'data' axis that divides the
    batch; None otherwise (callers then skip shard_map)."""
    mesh = _ACTIVE_MESH.get()
    if mesh is None or 'data' not in mesh.axis_names:
        return None
    data = mesh.shape['data']
    if data <= 1 or (batch_size is not None and batch_size % data != 0):
        return None
    return mesh


def active_model_parallel() -> int:
    """Size of the ambient mesh's 'model' axis (1 when no mesh is active).

    The Pallas coupling kernels are GSPMD-opaque and shard_map over 'data'
    only, so under tensor parallelism (``parallel/tp.py``) the decoder
    gates on this to resolve the coupling backend to flax/XLA, where GSPMD
    partitions the WaveNet matmuls over 'model'."""
    mesh = _ACTIVE_MESH.get()
    if mesh is None or 'model' not in mesh.axis_names:
        return 1
    return mesh.shape['model']


def data_shard_map(fn, mesh: Mesh, in_specs, out_specs):
    """``jax.shard_map`` over the mesh's 'data' axis (other axes unused).

    ``check_vma=False``: pallas_call outputs carry no varying-axes
    metadata, which the checker would otherwise reject; the wrapped ops
    are embarrassingly batch-parallel, so the check adds nothing here."""
    return jax.shard_map(fn, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=False)
