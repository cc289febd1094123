"""Tensor-parallel parameter partitioning over the mesh 'model' axis.

The reference is single-process single-GPU (``Train.py:27-35``) and has no
model-parallel story at all; this module is the TPU-native one: parameters
get ``PartitionSpec``s over the ``('data', 'model')`` mesh and XLA's GSPMD
propagates the shardings through the jitted train/eval/inference steps,
inserting the all-reduces over ICI — no module code changes, no manual
collectives.

Layout (classic column/row pairs, one all-reduce per pair):

* encoder attention — Q/K/V kernels column-parallel over the head axis
  (heads are contiguous ``d_head`` blocks of the 192-wide output:
  ``layers.py`` ``reshape(b, t, h, d)``), output projection row-parallel;
* encoder FFN — ``conv_0`` column-parallel over the 768 hidden channels,
  ``conv_1`` row-parallel back to 192;
* duration predictor — same pair over its 256 hidden channels;
* coupling WaveNet — ``start`` column-parallel (the hidden stream lives
  sharded over 'model'), every ``in_i`` row-parallel (contraction over the
  sharded hidden → one psum, the 2·ch gate activations come out replicated
  so the contiguous tanh/sigmoid halves split locally), ``res_skip``/``end``
  replicated (tiny 1×1s; their res output re-shards against the hidden
  stream for free in the elementwise add);
* everything else (embeddings, LayerNorms, prenet, ActNorm, inv-1×1,
  conditioning encoders) is replicated — sub-1 % of parameters and FLOPs.

Weight-norm interacts cleanly: ``WNConv1d`` normalises ``v`` over (k, in)
per output channel, so a row-sharded ``v`` just adds one tiny psum to the
norm; a column-sharded ``v`` keeps the reduction local and ``g``/``b``
shard with the output channels.

The Pallas kernels are opaque to GSPMD (they shard_map over 'data' only),
so under ``model_parallel > 1`` the coupling backends resolve to flax/XLA
(``models/decoder.py`` gates on :func:`mesh.active_model_parallel`); MAS
takes no parameters and keeps its data-axis shard_map.

Multi-host: placement uses ``jax.device_put`` to mesh-wide shardings, which
requires every device be addressable — tensor parallelism is validated
single-process (one host's chips over ICI, where it belongs; cross-DCN TP
is never the right layout for a 30 M-param model).
"""

from __future__ import annotations

import logging
import re
from typing import Any, Dict, List, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

logger = logging.getLogger(__name__)

# (path regex, spec) — first full match wins; no match → replicated.
# Paths are '/'-joined dict keys, e.g.
# 'encoder/block_0/attention/query/kernel'.
PARTITION_RULES: List[Tuple[str, P]] = [
    # --- encoder transformer: attention column(QKV)/row(proj) ---
    (r'encoder/block_\d+/attention/(query|key|value)/kernel',
     P(None, 'model')),
    (r'encoder/block_\d+/attention/(query|key|value)/bias', P('model')),
    (r'encoder/block_\d+/attention/proj/kernel', P('model', None)),
    # --- encoder FFN: column/row over the hidden channels ---
    (r'encoder/block_\d+/conv_0/conv/kernel', P(None, None, 'model')),
    (r'encoder/block_\d+/conv_0/conv/bias', P('model')),
    (r'encoder/block_\d+/conv_1/conv/kernel', P(None, 'model', None)),
    # --- duration predictor: column/row over its hidden channels ---
    (r'encoder/duration_predictor/conv_0/conv/kernel',
     P(None, None, 'model')),
    (r'encoder/duration_predictor/conv_0/conv/bias', P('model')),
    (r'encoder/duration_predictor/conv_1/conv/kernel',
     P(None, 'model', None)),
    # --- coupling WaveNet: start column (hidden stream sharded),
    #     in_i row (psum back to replicated gate activations) ---
    (r'decoder/flow_\d+/coupling/start/v', P(None, None, 'model')),
    (r'decoder/flow_\d+/coupling/start/(g|b)', P('model')),
    (r'decoder/flow_\d+/coupling/wavenet/in_\d+/v', P(None, 'model', None)),
]


def _path_str(path) -> str:
    parts = []
    for key in path:
        if hasattr(key, 'key'):        # DictKey
            parts.append(str(key.key))
        elif hasattr(key, 'idx'):      # SequenceKey
            parts.append(str(key.idx))
        elif hasattr(key, 'name'):     # GetAttrKey
            parts.append(str(key.name))
        else:
            parts.append(str(key))
    return '/'.join(parts)


def _dict_key_path(path) -> str:
    """Only the dict-key components — an optimizer-state leaf like
    ``.inner_states['train'].inner_state[1].mu['encoder']...['kernel']``
    reduces to ``train/encoder/.../kernel``: the parameter path it mirrors
    is a suffix (outer wrappers like ``multi_transform`` labels may add
    leading dict keys)."""
    return '/'.join(str(k.key) for k in path if hasattr(k, 'key'))


def _param_suffix_match(dict_path: str, specs: Dict[str, P]):
    """Longest parameter path that is a suffix of ``dict_path``."""
    if dict_path in specs:
        return dict_path
    best = None
    for cand in specs:
        if dict_path.endswith('/' + cand) and \
                (best is None or len(cand) > len(best)):
            best = cand
    return best


def _spec_for(path_s: str, shape, tp: int) -> P:
    for pattern, spec in PARTITION_RULES:
        if re.fullmatch(pattern, path_s):
            for dim, axis in enumerate(spec):
                if axis == 'model' and shape[dim] % tp:
                    logger.warning(
                        'tp: %s dim %d (%d) not divisible by model=%d — '
                        'replicating', path_s, dim, shape[dim], tp)
                    return P()
            return spec
    return P()


def param_specs(params, tp: int) -> Dict[str, P]:
    """Flat ``{path: PartitionSpec}`` for every parameter leaf."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    return {_path_str(p): _spec_for(_path_str(p), leaf.shape, tp)
            for p, leaf in flat}


def param_shardings(params, mesh: Mesh):
    """params-shaped tree of ``NamedSharding``."""
    tp = dict(zip(mesh.axis_names, mesh.devices.shape)).get('model', 1)
    specs = param_specs(params, tp)

    def build(path, leaf):
        return NamedSharding(mesh, specs[_path_str(path)])

    return jax.tree_util.tree_map_with_path(build, params)


def state_shardings(state, mesh: Mesh):
    """TrainState-shaped tree of ``NamedSharding``: params per the rules,
    optimizer moments mirroring their parameters (matched through the
    dict-key suffix of the optax state path), scalars/rng replicated."""
    tp = dict(zip(mesh.axis_names, mesh.devices.shape)).get('model', 1)
    specs = param_specs(state.params, tp)
    shapes = {_path_str(p): leaf.shape
              for p, leaf in
              jax.tree_util.tree_flatten_with_path(state.params)[0]}
    rep = NamedSharding(mesh, P())

    def build(path, leaf):
        key = _param_suffix_match(_dict_key_path(path), specs)
        if key is not None and getattr(leaf, 'shape', None) == shapes[key]:
            return NamedSharding(mesh, specs[key])
        return rep

    return jax.tree_util.tree_map_with_path(build, state)


def place_state(state, mesh: Mesh):
    """Commit a TrainState onto the mesh: tensor-parallel parameters and
    optimizer moments, replicated everything else.  With
    ``model_parallel == 1`` this is plain explicit replication (what jit
    was doing implicitly)."""
    if jax.process_count() > 1:
        raise NotImplementedError(
            'tensor-parallel state placement is single-process '
            '(multi-host runs are data-parallel over DCN: set '
            'TPU.model_parallel = 1)')
    shardings = state_shardings(state, mesh)
    return jax.tree_util.tree_map(jax.device_put, state, shardings)


def sharded_param_count(state_or_params, mesh: Mesh) -> Tuple[int, int]:
    """(parameters with a sharded dim, total parameters) — for logging."""
    params = getattr(state_or_params, 'params', state_or_params)
    tp = dict(zip(mesh.axis_names, mesh.devices.shape)).get('model', 1)
    specs = param_specs(params, tp)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    total = sum(leaf.size for _, leaf in flat)
    sharded = sum(leaf.size for p, leaf in flat
                  if any(axis == 'model' for axis in specs[_path_str(p)]))
    return sharded, total
