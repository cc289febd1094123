"""Monotonic Alignment Search (MAS) — on-device.

The reference implements this Viterbi-style DP as a Cython/OpenMP host kernel
(``monotonic_align/core.pyx:9-45``) plus a pure-numpy fallback
(``Modules.py:957-980``).  Every training step therefore round-trips
device→host→device and serialises the accelerator behind host compute
(``monotonic_align/__init__.py:12-21`` — the nine ``torch.cuda.synchronize()``
calls in ``Modules.py`` exist only because of this).

Here MAS runs **on the TPU**:

* :func:`maximum_path_scan` — a ``jax.lax.scan`` formulation.  The forward DP
  scans over mel frames carrying one value column, vectorised over batch and
  tokens on the VPU; the backtrace is a reverse scan emitting one-hot rows.
  Always available, differentiation-free (the DP is inside ``stop_gradient``
  semantics anyway — the reference computes it under ``torch.no_grad()``).
* :func:`maximum_path_pallas` — a Pallas TPU kernel doing the same DP with the
  batch tiled onto sublanes and both loops fused into a single kernel.  The
  direction bits are staged *in the output buffer* (the backtrace reads the
  direction row for frame ``y`` and overwrites it with the one-hot path row),
  halving VMEM pressure.
* :func:`maximum_path_numpy` — the test oracle, a direct banded DP.

The recurrence (reference ``monotonic_align/core.pyx:17-30``)::

    value[x, y] = max(stay, move) + log_p[x, y]
    stay = value[x, y-1]    (illegal when x == y)
    move = value[x-1, y-1]  (x == 0: 0 at y == 0 else illegal)

Backtrace (``core.pyx:32-35``): walk from (t_x-1, t_y-1) backwards, stepping
to token x-1 when ``x == y`` or ``value[x, y-1] < value[x-1, y-1]``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1.0e9   # "illegal transition" score; stays finite over ~1e4 frames


# ---------------------------------------------------------------------------
# numpy oracle
# ---------------------------------------------------------------------------

def maximum_path_numpy(log_p: np.ndarray,
                       token_lengths: np.ndarray,
                       mel_lengths: np.ndarray) -> np.ndarray:
    """Reference-exact banded DP on host; the golden model for tests.

    log_p: [B, T_tok, T_mel] float32 (already masked)
    Returns path [B, T_tok, T_mel] in {0, 1}.
    """
    log_p = np.array(log_p, dtype=np.float32, copy=True)
    paths = np.zeros_like(log_p, dtype=np.int32)
    for b in range(log_p.shape[0]):
        _maximum_path_single(log_p[b], paths[b],
                             int(token_lengths[b]), int(mel_lengths[b]))
    return paths


def _maximum_path_single(value, path, t_x, t_y):
    for y in range(t_y):
        for x in range(max(0, t_x + y - t_y), min(t_x, y + 1)):
            stay = _NEG if x == y else value[x, y - 1]
            if x == 0:
                move = 0.0 if y == 0 else _NEG
            else:
                move = value[x - 1, y - 1]
            value[x, y] = max(stay, move) + value[x, y]
    index = t_x - 1
    for y in range(t_y - 1, -1, -1):
        path[index, y] = 1
        if index != 0 and (index == y
                           or value[index, y - 1] < value[index - 1, y - 1]):
            index -= 1


# ---------------------------------------------------------------------------
# lax.scan formulation (portable: CPU / TPU / interpreter)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=())
def maximum_path_scan(log_p: jax.Array,
                      token_lengths: jax.Array,
                      mel_lengths: jax.Array) -> jax.Array:
    """Batched MAS via two ``lax.scan`` passes over mel frames.

    log_p: [B, T_tok, T_mel] (any float dtype; DP runs in float32)
    token_lengths, mel_lengths: [B] int32
    Returns path [B, T_tok, T_mel] float32 in {0, 1}.
    """
    B, T_tok, T_mel = log_p.shape
    log_p_f = log_p.astype(jnp.float32)
    # scan over mel frames → time-major [T_mel, B, T_tok]
    lp = jnp.transpose(log_p_f, (2, 0, 1))
    x_idx = jnp.arange(T_tok)[None, :]                      # [1, T_tok]

    def forward(v_prev, inputs):
        lp_row, y = inputs                                   # [B,T_tok], []
        shifted = jnp.concatenate(
            [jnp.full((B, 1), _NEG, jnp.float32), v_prev[:, :-1]], axis=1)
        stay = jnp.where(x_idx == y, _NEG, v_prev)
        move = jnp.where(x_idx == 0,
                         jnp.where(y == 0, 0.0, _NEG), shifted)
        # Direction bit: "came from token x-1".  Uses raw (unmasked) column
        # values exactly like the reference backtrace comparison
        # (core.pyx:34); x == 0 rows are guarded at backtrace time.
        direction = (x_idx == y) | (v_prev < shifted)
        v = jnp.maximum(stay, move) + lp_row
        return v, direction

    # derive the init from a (possibly shard_map-varying) input so the
    # carry's manual axes match the body output under shard_map
    v0 = jnp.full_like(lp[0], _NEG)
    _, directions = jax.lax.scan(
        forward, v0, (lp, jnp.arange(T_mel)))                # [T_mel,B,T_tok]

    def backward(index, inputs):
        dir_row, y = inputs                                  # [B,T_tok], []
        active = (y < mel_lengths)[:, None]                  # [B,1]
        onehot = (x_idx == index[:, None]) & active          # [B,T_tok]
        dir_at = jnp.sum(
            jnp.where(onehot, dir_row, False), axis=1)       # [B]
        step = active[:, 0] & (index > 0) & dir_at
        return index - step.astype(index.dtype), onehot

    idx0 = token_lengths.astype(jnp.int32) - 1
    _, path = jax.lax.scan(
        backward, idx0, (directions, jnp.arange(T_mel)), reverse=True)
    # path: [T_mel, B, T_tok] bool → [B, T_tok, T_mel] float32
    return jnp.transpose(path, (1, 2, 0)).astype(jnp.float32)


# ---------------------------------------------------------------------------
# Pallas TPU kernel
# ---------------------------------------------------------------------------

_CHUNK = 64          # mel frames per streamed DMA chunk


def _mas_kernel(tx_ref, ty_ref, lp_hbm, path_hbm,
                dir_ref, lp_buf, in_sems, out_sem):
    """Fused forward-DP + backtrace for one batch tile.

    The log-probability matrix stays in HBM and is streamed into VMEM in
    ``_CHUNK``-frame slabs with double-buffered async DMA; the direction-bit
    table lives once in VMEM, is overwritten in place by the backtrace with
    the one-hot path rows, and is DMA'd out as the result.

    Layouts (time-major so a per-frame row is a leading-dim slice):
      tx_ref, ty_ref: [B_t, 1]            i32  (VMEM, blocked per tile)
      lp_hbm:   [T_mel, B, T_tok]         f32  (HBM, whole array)
      path_hbm: [T_mel, B, T_tok]         bf16 (HBM, whole array, output)
      dir_ref:  [T_mel, B_t, T_tok]       bf16 (VMEM scratch; holds exact
                 0/1 direction bits — bf16 halves VMEM so the batch tile
                 fills all 16 bf16 sublanes)
      lp_buf:   [2, _CHUNK, B_t, T_tok]   f32  (VMEM scratch, double buffer)

    The DP value column is a loop-carried *value* (vector registers), not a
    scratch Ref — the sequential dependence then never round-trips VMEM.
    """
    T_mel, B_t, T_tok = dir_ref.shape
    tile = pl.program_id(0)
    num_chunks = T_mel // _CHUNK
    x_iota = jax.lax.broadcasted_iota(jnp.int32, (B_t, T_tok), 1)
    ty = ty_ref[:, :1]                                       # [B_t, 1]

    def chunk_dma(slot, chunk):
        return pltpu.make_async_copy(
            lp_hbm.at[pl.ds(chunk * _CHUNK, _CHUNK),
                      pl.ds(tile * B_t, B_t), :],
            lp_buf.at[slot],
            in_sems.at[slot])

    chunk_dma(0, 0).start()

    def forward_chunk(chunk, v):
        slot = jax.lax.rem(chunk, 2)

        @pl.when(chunk + 1 < num_chunks)
        def _():
            chunk_dma(1 - slot, chunk + 1).start()

        chunk_dma(slot, chunk).wait()

        def forward(r, v_prev):
            y = chunk * _CHUNK + r
            lp_row = lp_buf[slot, r]                         # [B_t, T_tok]
            shifted = pltpu.roll(v_prev, shift=1, axis=1)
            stay = jnp.where(x_iota == y, _NEG, v_prev)
            move = jnp.where(x_iota == 0,
                             jnp.where(y == 0, 0.0, _NEG), shifted)
            direction = (x_iota == y) | (v_prev < shifted)
            dir_ref[y] = direction.astype(jnp.bfloat16)
            return jnp.maximum(stay, move) + lp_row

        # mosaic supports only unroll=1 or full unroll; the 64-step chunk
        # body is small enough to fully unroll (kills per-step loop latency)
        return jax.lax.fori_loop(0, _CHUNK, forward, v, unroll=_CHUNK)

    v_init = jnp.full((B_t, T_tok), _NEG, jnp.float32)
    jax.lax.fori_loop(0, num_chunks, forward_chunk, v_init)

    def backward(i, index):
        y = T_mel - 1 - i
        dir_row = dir_ref[y].astype(jnp.float32)             # [B_t, T_tok]
        active = y < ty                                      # [B_t, 1]
        at_index = x_iota == index                           # [B_t, T_tok]
        onehot = at_index & active
        dir_at = jnp.sum(jnp.where(at_index, dir_row, 0.0),
                         axis=1, keepdims=True)              # [B_t, 1]
        dir_ref[y] = onehot.astype(jnp.bfloat16)
        step = active & (index > 0) & (dir_at > 0.5)
        return index - step.astype(jnp.int32)

    def backward_chunk(cc, index):
        base = T_mel - (cc + 1) * _CHUNK

        def step(r, idx):
            return backward(T_mel - 1 - (base + _CHUNK - 1 - r), idx)

        return jax.lax.fori_loop(0, _CHUNK, step, index, unroll=_CHUNK)

    jax.lax.fori_loop(0, T_mel // _CHUNK, backward_chunk,
                      tx_ref[:, :1] - 1)

    out_dma = pltpu.make_async_copy(
        dir_ref, path_hbm.at[:, pl.ds(tile * B_t, B_t), :], out_sem)
    out_dma.start()
    out_dma.wait()


# TPU cores have ~16 MiB of VMEM; leave headroom for Mosaic's own
# temporaries and the loop-carried vector registers.
_VMEM_BUDGET_BYTES = 13 * 1024 * 1024


def _pallas_vmem_bytes(t_mel: int, b_t: int, t_tok: int) -> int:
    """Static VMEM footprint of :func:`maximum_path_pallas` scratch buffers."""
    return (t_mel * b_t * t_tok * 2           # dir/path table (bf16)
            + 2 * _CHUNK * b_t * t_tok * 4    # lp stream double buffer (f32)
            + 4 * b_t * t_tok * 4)            # value column + temporaries


def maximum_path_pallas(log_p: jax.Array,
                        token_lengths: jax.Array,
                        mel_lengths: jax.Array,
                        batch_tile: int = 16) -> jax.Array:
    """MAS as a single Pallas TPU kernel, batch tiled onto VPU sublanes.

    log_p: [B, T_tok, T_mel]; lengths [B].  Returns [B, T_tok, T_mel] f32.
    T_tok is padded to a lane multiple (128) and T_mel to a chunk multiple.

    The direction table must fit in VMEM; for shapes where it cannot
    (T_mel × 16 × T_tok_padded bf16 beyond ~13 MiB) this falls back to the
    bit-identical :func:`maximum_path_scan` path with a warning instead of
    dying in a Mosaic allocation error.
    """
    B, T_tok_in, T_mel_in = log_p.shape
    b_t = batch_tile
    est_mel = T_mel_in + (-T_mel_in) % _CHUNK
    est_tok = T_tok_in + (-T_tok_in) % 128
    needed = _pallas_vmem_bytes(est_mel, b_t, est_tok)
    if needed > _VMEM_BUDGET_BYTES:
        import warnings
        warnings.warn(
            f'MAS pallas kernel needs ~{needed / 2 ** 20:.1f} MiB VMEM for '
            f'shape [{B}, {T_tok_in}, {T_mel_in}] (budget '
            f'{_VMEM_BUDGET_BYTES / 2 ** 20:.0f} MiB) — falling back to the '
            'lax.scan path', stacklevel=2)
        return maximum_path_scan(log_p, token_lengths, mel_lengths)
    pad_b = (-B) % b_t
    pad_tok = (-T_tok_in) % 128
    pad_mel = (-T_mel_in) % _CHUNK
    if pad_b or pad_tok or pad_mel:
        log_p = jnp.pad(log_p, ((0, pad_b), (0, pad_tok), (0, pad_mel)))
        token_lengths = jnp.pad(token_lengths, (0, pad_b), constant_values=1)
        mel_lengths = jnp.pad(mel_lengths, (0, pad_b), constant_values=1)
    Bp, T_tok, T_mel = (B + pad_b, T_tok_in + pad_tok, T_mel_in + pad_mel)

    lp = jnp.transpose(log_p.astype(jnp.float32), (2, 0, 1))  # [T_mel,B,T_tok]
    tx = token_lengths.astype(jnp.int32).reshape(Bp, 1)
    ty = mel_lengths.astype(jnp.int32).reshape(Bp, 1)

    out = pl.pallas_call(
        _mas_kernel,
        grid=(Bp // b_t,),
        in_specs=[
            pl.BlockSpec((b_t, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b_t, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((T_mel, Bp, T_tok), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((T_mel, b_t, T_tok), jnp.bfloat16),   # dir/path table
            pltpu.VMEM((2, _CHUNK, b_t, T_tok), jnp.float32),  # lp stream
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(
                T_mel * b_t * T_tok * 2 + 2 * _CHUNK * b_t * T_tok * 4
                + 4 * b_t * T_tok * 4 + 1024 * 1024),
        ),
    )(tx, ty, lp)

    # bf16 holds 0/1 exactly; widen outside the kernel
    path = jnp.transpose(out, (1, 2, 0)).astype(jnp.float32)
    return path[:B, :T_tok_in, :T_mel_in]


# ---------------------------------------------------------------------------
# dispatcher
# ---------------------------------------------------------------------------

def maximum_path(log_p: jax.Array,
                 token_lengths: jax.Array,
                 mel_lengths: jax.Array,
                 backend: str = 'pallas') -> jax.Array:
    """Dispatch MAS to a backend.

    'pallas' — fused TPU kernel (default on TPU).
    'scan'   — lax.scan formulation (any backend; CPU test meshes).
    'cpp'    — host C++/OpenMP kernel (mirrors the reference's native path;
               incurs a device→host round trip, provided for parity).
    'numpy'  — host oracle.

    Under an ambient mesh (``parallel.mesh.activate_mesh``) the on-device
    backends are shard_mapped over the 'data' axis so each chip runs the
    DP on its own micro-batch — a Pallas custom-call is opaque to GSPMD
    and would otherwise be computed on gathered (replicated) operands.
    """
    if backend in ('pallas', 'scan'):
        from glow_tts_tpu.parallel import mesh as mesh_lib
        mesh = mesh_lib.active_data_mesh(log_p.shape[0])
        if mesh is not None:
            from jax.sharding import PartitionSpec as P
            fn = (maximum_path_pallas if backend == 'pallas'
                  else maximum_path_scan)
            return mesh_lib.data_shard_map(
                fn, mesh,
                in_specs=(P('data'), P('data'), P('data')),
                out_specs=P('data'))(log_p, token_lengths, mel_lengths)
    if backend == 'pallas':
        return maximum_path_pallas(log_p, token_lengths, mel_lengths)
    if backend == 'scan':
        return maximum_path_scan(log_p, token_lengths, mel_lengths)
    if backend == 'cpp':
        from glow_tts_tpu.ops import mas_cpp
        return mas_cpp.maximum_path_cpp(log_p, token_lengths, mel_lengths)
    if backend == 'numpy':
        return jnp.asarray(maximum_path_numpy(
            np.asarray(log_p), np.asarray(token_lengths),
            np.asarray(mel_lengths)))
    raise ValueError(f'Unknown MAS backend: {backend}')
