"""Fused WaveNet affine-coupling kernel (Pallas TPU).

The coupling's gated WaveNet dominates both flow directions (reference
``Modules.py:760-887``; SURVEY §3.1).  XLA runs it as ``n_layers`` ×
(k-tap conv → cond add → tanh·σ gate → res/skip 1×1) with every
``[B, T, 2·192]`` intermediate round-tripping HBM, and the 192-channel
contractions underfill the 128-lane MXU tiling.  This kernel keeps the
whole coupling VMEM-resident::

    start 1×1 → n × (conv taps + cond + gate + res/skip) → end 1×1
    → affine transform (+ fp32 logdet)

in one ``pallas_call``.  Design notes:

* **Batch packed into sublanes.**  Samples are laid along the row axis
  with ``k-1`` zero rows between them, so the k conv taps of adjacent
  samples cannot touch.  Every tap then becomes ONE ``[P, ch] × [ch, 2ch]``
  MXU matmul with ``P ≈ batch_tile · T`` rows — large-M, never per-sample.
* **Per-sample conditioning via the MXU.**  The per-layer additive bias
  (conv bias + speaker/prosody projections, shape ``[B, 2ch]``) differs per
  sample inside a packed block; a one-hot row→sample indicator matmul
  (``[P, Bt] × [Bt, 2ch]``) broadcasts it without per-row VPU work.
* **Weight residency by dtype.**  bf16 weights (~7 MB) sit in VMEM for the
  whole grid; f32 weights (~14 MB) exceed VMEM and are double-buffer
  streamed from HBM per layer, overlapping layer ``i+1``'s DMA with layer
  ``i``'s compute.
* **Chunk-interleaved phases.**  Each layer's rows are processed in
  chunks with all im2col builds (VPU) and conv matmuls (MXU) issued
  per-chunk before the gate/res-skip phase, so the scheduler can overlap
  chunk ``c+1``'s VPU build with chunk ``c``'s MXU pass.
* fp32 accumulation everywhere (``preferred_element_type``); the affine
  transform and log-determinant are computed in fp32 regardless of the
  activation dtype, matching the repo-wide "fp32 for flow logdets" policy.
* **f32 via in-kernel 3-pass decomposition.**  Mosaic lowers f32 dots to
  a single bf16 MXU pass by default (measured ~2.7e-1 max error on a
  K=512 matmul vs fp32), which would silently break the f32
  selective-precision inference policy — so with f32 activations every
  kernel dot runs the explicit bf16_3x split (:func:`_mk_dot`), the same
  3-pass contraction XLA's ``tensorfloat32`` policy performs, at 3× the
  MXU passes.  (The interpreter computes exact f32 — CPU parity tests
  pin the exact path by default and opt into ``mxu3x=True`` to test the
  decomposition's accuracy.)

The kernel reproduces the deterministic (no-dropout) path of the reference
coupling bit-for-bit in f32; training keeps the flax path (dropout RNG
lives there).  Parity: ``tests/test_coupling_fused.py``.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _chunks(p: int, nc: int):
    base = (p // nc) // 8 * 8
    out = [(ci * base, base) for ci in range(nc - 1)]
    out.append(((nc - 1) * base, p - (nc - 1) * base))
    return out


def _mk_dot(mxu3x: bool):
    """Return the kernel's matmul primitive.

    ``mxu3x=False``: one MXU pass with fp32 accumulation (exact for bf16
    operands — the bf16 configuration).

    ``mxu3x=True``: the 3-pass bf16 decomposition of an f32×f32 product
    (``a·b ≈ a_hi·b_hi + a_hi·b_lo + a_lo·b_hi`` with
    ``x_hi = bf16(x), x_lo = bf16(x - x_hi)``) — the same split XLA's
    ``tensorfloat32``/HIGH precision performs for f32 dots on TPU, done
    manually because Mosaic lowers an f32 ``jnp.dot`` to a SINGLE bf16
    pass (measured ~2.7e-1 max err at K=512).  This is what lets the
    fused kernels serve the f32+tf32 selective-precision inference
    policy (config ``tpu.inference_*_matmul_precision``).

    Every dot pins ``precision=DEFAULT``: the kernels trace under the
    caller's ambient ``jax.default_matmul_precision`` scope, and a
    'highest' ambient makes Mosaic emit ``contract_precision<fp32>`` on
    bf16 operands, which its matmul lowering rejects ('Bad lhs type' on
    v5e).  DEFAULT is exact for bf16 operands (one MXU pass, fp32
    accumulation), so pinning loses nothing."""
    if not mxu3x:
        return functools.partial(jnp.dot,
                                 preferred_element_type=jnp.float32,
                                 precision=jax.lax.Precision.DEFAULT)

    def dot3(a, b):
        a = a.astype(jnp.float32)
        b = b.astype(jnp.float32)
        ah = a.astype(jnp.bfloat16)
        al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
        bh = b.astype(jnp.bfloat16)
        bl = (b - bh.astype(jnp.float32)).astype(jnp.bfloat16)
        d = functools.partial(jnp.dot, preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.DEFAULT)
        return d(ah, bh) + d(ah, bl) + d(al, bh)

    return dot3


def _coupling_body(xa_v, xbv, m, dt, n, k, ch, c2, p, pad, chunks,
                   ws_v, bs_v, get_win, get_wrs, get_brs, get_cond,
                   we_v, be_v, ind, xp, xi, out_s,
                   pit_v=None, get_wp=None, reverse=False,
                   stream_ctl=None, dot=None,
                   get_bin=None, get_drop=None):
    """The shared WaveNet-coupling core: start 1×1 → ``n`` gated layers →
    end 1×1 → affine transform.  Weight access goes through getters so the
    same core serves VMEM-resident weights, manually DMA-streamed weights
    (the f32 single-step configuration) and grid-block-streamed weights
    (the 12-step stack kernel); the matmul primitive comes from
    :func:`_mk_dot` (single-pass bf16 or the 3-pass f32 decomposition).

    Training (``get_drop`` set): dropout is applied to the in-conv output
    *including its bias* — ``get_bin(i)`` [1, 2ch] f32 — before the
    conditioning adds, matching the reference order
    (``Modules.py:858-869``); ``get_cond`` then carries ONLY the
    post-dropout conditioning projections and may be ``None`` (Vanilla).
    ``get_drop(i, o, L)`` returns the {0, 1/(1−rate)} keep-scale block
    for rows ``o..o+L`` (``ops/dropmask.py``).

    Returns ``(z_b, logs)`` both ``[P, c2]`` fp32."""
    if dot is None:
        dot = _mk_dot(False)
    # start 1×1: h = (x_a @ W_start + b_start) * mask
    h = dot(xa_v, ws_v)
    h = (h + bs_v[None, :]) * m

    xp[...] = jnp.zeros((p + 2 * pad, ch), dt)
    xp[pad:pad + p] = h.astype(dt)
    out_s[...] = jnp.zeros((p, ch), jnp.float32)

    for i in range(n):
        if stream_ctl is not None:
            stream_ctl(i)
        w_i = get_win(i)
        w_r = get_wrs(i)

        # phase 1: per-chunk im2col builds interleaved with the conv
        # matmuls so the VPU build of chunk c+1 overlaps the MXU pass
        # of chunk c
        accs = []
        for (o, L) in chunks:
            for d in range(k):
                xi[o:o + L, d * ch:(d + 1) * ch] = xp[o + d:o + d + L]
            accs.append(dot(xi[o:o + L], w_i))
        # phase 2: gates (VPU) interleaved with res/skip matmuls (MXU)
        rss = []
        for ci, (o, L) in enumerate(chunks):
            if get_bin is not None:
                # train formulation: conv bias separate, dropout on
                # conv+bias, conditioning added after (may be absent)
                acc = accs[ci] + get_bin(i)
                if get_drop is not None:
                    acc = acc * get_drop(i, o, L)
                if get_cond is not None:
                    acc = acc + dot(ind[o:o + L], get_cond(i))
            else:
                acc = accs[ci] + dot(ind[o:o + L], get_cond(i))
            if pit_v is not None:
                acc += dot(pit_v[o:o + L], get_wp(i))
            g = jnp.tanh(acc[:, :ch]) * jax.nn.sigmoid(acc[:, ch:])
            rss.append(dot(g.astype(dt), w_r))
        # phase 3: residual / skip updates (reads of xp all happened in
        # phase 1, so in-place updates are hazard-free)
        for ci, (o, L) in enumerate(chunks):
            rs = rss[ci] + get_brs(i)[None, :]
            if i < n - 1:
                xp[pad + o:pad + o + L] = (
                    (xp[pad + o:pad + o + L].astype(jnp.float32)
                     + rs[:, :ch]) * m[o:o + L]).astype(dt)
            out_s[o:o + L] = out_s[o:o + L] + rs[:, ch:]

    out = out_s[...] * m
    outs = dot(out.astype(dt), we_v) + be_v[None, :]
    mean, logs = outs[:, :c2], outs[:, c2:]
    if reverse:
        z = (xbv - mean) * jnp.exp(-logs) * m
    else:
        z = (mean + jnp.exp(logs) * xbv) * m
    return z, logs


def _make_kernel(n: int, k: int, ch: int, c2: int, bt: int, r: int, t: int,
                 p: int, reverse: bool, has_pitch: bool, stream: bool,
                 flowstep: bool = False, nc: int = 2, mxu3x: bool = False):
    pad = (k - 1) // 2
    dot = _mk_dot(mxu3x)

    def kernel(*refs):
        it = iter(refs)
        if flowstep:
            x_ref, m_ref, ind, cond = (next(it) for _ in range(4))
            an, mix = next(it), next(it)
            ldc = None if reverse else next(it)
        else:
            xa, xb, m_ref, ind, cond = (next(it) for _ in range(5))
        ws, bs, w_in, w_rs, brs, we, be = (next(it) for _ in range(7))
        if has_pitch:
            pit, wp = next(it), next(it)
        zb = next(it)
        ld = None if reverse else next(it)
        xp, xi, out_s = next(it), next(it), next(it)
        if stream:
            win_buf, wrs_buf, sems = next(it), next(it), next(it)

        dt = x_ref.dtype if flowstep else xa.dtype
        m = m_ref[0]                                   # [P, 1] float32

        if flowstep:
            if reverse:
                # reverse flow step runs coupling⁻¹ first on the raw input
                xa_v = x_ref[0][:, :c2]
                xbv = x_ref[0][:, c2:].astype(jnp.float32)
            else:
                # ActNorm → invertible 1×1 (as one [P,C]×[C,C] matmul with
                # the block-sparse mixing folded in) → coupling halves
                xv = x_ref[0].astype(jnp.float32)
                y = (an[1][None, :] + jnp.exp(an[0])[None, :] * xv) * m
                yd = dot(y.astype(dt), mix[...]) * m
                xa_v = yd[:, :c2].astype(dt)
                xbv = yd[:, c2:]
        else:
            xa_v = xa[0]
            xbv = xb[0].astype(jnp.float32)

        def dma_in(i, slot):
            return pltpu.make_async_copy(w_in.at[i], win_buf.at[slot],
                                         sems.at[0, slot])

        def dma_rs(i, slot):
            return pltpu.make_async_copy(w_rs.at[i], wrs_buf.at[slot],
                                         sems.at[1, slot])

        stream_ctl = None
        if stream:
            dma_in(0, 0).start()
            dma_rs(0, 0).start()

            def stream_ctl(i):
                if i + 1 < n:
                    dma_in(i + 1, (i + 1) % 2).start()
                    dma_rs(i + 1, (i + 1) % 2).start()
                dma_in(i, i % 2).wait()
                dma_rs(i, i % 2).wait()

        z, logs = _coupling_body(
            xa_v, xbv, m, dt, n, k, ch, c2, p, pad, _chunks(p, nc),
            ws[...], bs[0],
            (lambda i: win_buf[i % 2]) if stream else (lambda i: w_in[i]),
            (lambda i: wrs_buf[i % 2]) if stream else (lambda i: w_rs[i]),
            lambda i: brs[i], lambda i: cond[0, i],
            we[...], be[0], ind, xp, xi, out_s,
            pit_v=pit[0] if has_pitch else None,
            get_wp=(lambda i: wp[i]) if has_pitch else None,
            reverse=reverse, stream_ctl=stream_ctl, dot=dot)

        if flowstep:
            if reverse:
                # coupling⁻¹ done; undo the 1×1 mix then ActNorm
                y = jnp.concatenate([xa_v.astype(jnp.float32), z], axis=1)
                yd = dot(y.astype(dt), mix[...]) * m
                zfull = (yd - an[1][None, :]) * jnp.exp(-an[0])[None, :] * m
                zb[0] = zfull.astype(dt)
            else:
                zb[0] = jnp.concatenate(
                    [xa_v.astype(jnp.float32), z], axis=1).astype(dt)
                lm = logs * m
                gi = pl.program_id(0)
                for bi in range(bt):
                    # coupling logdet + (ActNorm + invconv) per-frame const
                    ld[gi, bi] = (jnp.sum(lm[bi * r:bi * r + t])
                                  + ldc[0, 0]
                                  * jnp.sum(m[bi * r:bi * r + t]))
            return

        if not reverse:
            lm = logs * m
            # the logdet block is the whole [nb, bt] array (constant index
            # map — Mosaic requires full trailing dims for tiny blocks);
            # each program writes its own row
            gi = pl.program_id(0)
            for bi in range(bt):
                ld[gi, bi] = jnp.sum(lm[bi * r:bi * r + t])
        zb[0] = z.astype(dt)

    return kernel


def _make_mega_kernel(n: int, k: int, ch: int, c2: int, bt: int, r: int,
                      t: int, p: int, s_steps: int, reverse: bool,
                      has_pitch: bool, nc: int = 2, mxu3x: bool = False,
                      stream: bool = False):
    """The 12-step flow-stack kernel body.

    One grid step = one (batch block, flow step) pair; the flow axis is
    the innermost grid dimension, so for a fixed batch block the ``s_steps``
    flow steps run back-to-back with

    * the activation carried in the revisited OUTPUT block (constant-in-j
      index map → Mosaic keeps it VMEM-resident across the whole flow
      stack and flushes to HBM once per batch block),
    * per-step weights delivered by BlockSpec index maps over the stacked
      ``[S, ...]`` weight arrays — Mosaic double-buffers the next step's
      weights during the current step's compute (the manual-DMA streaming
      of the single-step kernel, for free),
    * the log-determinant accumulated across steps in the SMEM output.

    The per-step math is identical to ``_make_kernel(flowstep=True)``
    (shared ``_coupling_body``); step order on the inverse pass is
    reversed by the index maps, not by the kernel.

    ``stream=True`` (the f32 configuration): the big per-layer weights
    (``w_in``/``w_rs``) stay whole in HBM (``pl.ANY``) and are manually
    double-buffer DMA-streamed per (step, layer) — the f32 weight blocks
    that BlockSpec streaming would double-buffer (~14 MB) do not fit the
    ~16 MB VMEM next to the f32 im2col scratch.
    """
    pad = (k - 1) // 2
    dot = _mk_dot(mxu3x)

    def kernel(*refs):
        it = iter(refs)
        x_ref, m_ref, ind, cond, an, mix = (next(it) for _ in range(6))
        ldc = None if reverse else next(it)
        ws, bs, w_in, w_rs, brs, we, be = (next(it) for _ in range(7))
        if has_pitch:
            pit, wp = next(it), next(it)
        zb = next(it)
        ld = None if reverse else next(it)
        xp, xi, out_s = next(it), next(it), next(it)
        if stream:
            win_buf, wrs_buf, sems = next(it), next(it), next(it)

        gi = pl.program_id(0)
        j = pl.program_id(1)
        dt = x_ref.dtype
        m = m_ref[0]                                   # [P, 1] float32

        stream_ctl = None
        if stream:
            # actual flow-step index (the weight index maps express the
            # inverse order for the BlockSpec'd operands; the manual DMAs
            # must do the same)
            sj = (s_steps - 1 - j) if reverse else j

            def dma_in(i, slot):
                return pltpu.make_async_copy(
                    w_in.at[sj, i], win_buf.at[slot], sems.at[0, slot])

            def dma_rs(i, slot):
                return pltpu.make_async_copy(
                    w_rs.at[sj, i], wrs_buf.at[slot], sems.at[1, slot])

            dma_in(0, 0).start()
            dma_rs(0, 0).start()

            def stream_ctl(i):
                if i + 1 < n:
                    dma_in(i + 1, (i + 1) % 2).start()
                    dma_rs(i + 1, (i + 1) % 2).start()
                dma_in(i, i % 2).wait()
                dma_rs(i, i % 2).wait()

        # seed the VMEM carry from the input on the first flow step
        @pl.when(j == 0)
        def _seed():
            zb[0] = x_ref[0]
            if not reverse:
                for bi in range(bt):
                    ld[gi, bi] = 0.0

        xcur = zb[0]
        if reverse:
            xa_v = xcur[:, :c2]
            xbv = xcur[:, c2:].astype(jnp.float32)
        else:
            xv = xcur.astype(jnp.float32)
            y = (an[0, 1][None, :] + jnp.exp(an[0, 0])[None, :] * xv) * m
            yd = dot(y.astype(dt), mix[0]) * m
            xa_v = yd[:, :c2].astype(dt)
            xbv = yd[:, c2:]

        z, logs = _coupling_body(
            xa_v, xbv, m, dt, n, k, ch, c2, p, pad, _chunks(p, nc),
            ws[0], bs[0, 0],
            (lambda i: win_buf[i % 2]) if stream else (lambda i: w_in[0, i]),
            (lambda i: wrs_buf[i % 2]) if stream else (lambda i: w_rs[0, i]),
            lambda i: brs[0, i], lambda i: cond[0, 0, i],
            we[0], be[0, 0], ind, xp, xi, out_s,
            pit_v=pit[0] if has_pitch else None,
            get_wp=(lambda i: wp[0, i]) if has_pitch else None,
            reverse=reverse, stream_ctl=stream_ctl, dot=dot)

        if reverse:
            # coupling⁻¹ done; undo the 1×1 mix then ActNorm
            y = jnp.concatenate([xa_v.astype(jnp.float32), z], axis=1)
            yd = dot(y.astype(dt), mix[0]) * m
            zfull = (yd - an[0, 1][None, :]) * jnp.exp(-an[0, 0])[None, :] * m
            zb[0] = zfull.astype(dt)
        else:
            zb[0] = jnp.concatenate(
                [xa_v.astype(jnp.float32), z], axis=1).astype(dt)
            lm = logs * m
            # ldc arrives whole ([S, 1] in SMEM; sub-(8,128) blocks fail
            # Mosaic lowering) — index the forward flow step directly
            for bi in range(bt):
                ld[gi, bi] = ld[gi, bi] + (
                    jnp.sum(lm[bi * r:bi * r + t])
                    + ldc[j, 0] * jnp.sum(m[bi * r:bi * r + t]))

    return kernel


def pick_batch_tile(t: int, k: int, ch: int, c: int, dt,
                    *, n: int = 4, train: bool = False, nc: int = 2,
                    requested: Optional[int] = None,
                    budget: int = 15_700_000) -> int:
    """VMEM-aware batch tile for the flow-stack kernels (the analogue of
    ``ops/mas.py``'s VMEM guard).

    Calibrated against hardware compile probes at production length
    (``benchmarks/calibrate_vmem.py``, v5e t=384, 2026-08-19): Mosaic
    double-buffers every grid-streamed block (x/z/ckpt cost 2×), the
    train kernels' counter-hash dropout masks live as per-chunk
    ``(p/nc, 2ch)`` f32 vector temporaries on the stack, and the f32
    3-pass MXU decomposition materialises bf16 hi/lo copies of both dot
    operands.  Measured scoped-VMEM, estimate → verdict:

    * bf16 non-train  bt=4: est 14.2 M → fits (hardware: fits)
    * bf16 train fwd  bt=4: est 22.3 M → reject (hardware: 23.9 M OOM)
    * bf16 train fwd  bt=2: est 14.8 M → fits (hardware: fits)
    * f32  non-train  bt=4: est 23.8 M → reject (hardware: 22.41 M OOM)
    * f32  non-train  bt=2: est 14.8 M → fits (hardware: fits)
    Probe methodology caveat (cost half a round): compile-probing the
    kernels with CLOSURE-CONSTANT operands reports different scoped-VMEM
    than the production path (decoder ``apply`` with params as jit
    arguments) — constant folding changes the custom call's operand
    layouts and Mosaic's padding with them (direct-call probe: bf16
    bt=4 "OOM 21.53 M"; the identical shapes through the decoder:
    fits, and measured 4.59 ms on hardware).  Calibration probes must
    therefore go through the decoder path; the OOM rows above were all
    confirmed by production-path compiles.

    ``requested`` overrides the estimate."""
    if requested is not None:
        return requested
    esz = 2 if dt == jnp.bfloat16 else 4
    mxu3x = esz == 4             # on hardware f32 runs the 3-pass path
    # manual per-layer weight streaming: always at f32; the train
    # forward also streams bf16 at production length (its BlockSpec
    # variant measured 16.58 M scoped VMEM vs the 16.20 M limit inside
    # the full train step, v5e 2026-08-19) — mirror of the policy in
    # coupling_grad._fwd_call
    stream = esz == 4 or (train and t + (k - 1) > 256)
    pad = (k - 1) // 2
    r = t + 2 * pad
    kch, ch2 = k * ch, 2 * ch
    # weights: bf16 keeps per-step stacks in double-buffered BlockSpec
    # blocks; f32 manually DMA-streams per layer through 2 slots
    slots = 2 if stream else 2 * n
    fixed = slots * (kch * ch2 + ch * ch2) * esz + (1 << 20)   # + misc
    if mxu3x:
        # bf16 hi/lo of the weight operand (b-side of every dot)
        fixed += 2 * kch * ch2 * 2
    # per packed row: x+z grid blocks double-buffered, im2col columns,
    # padded activations, f32 skip accumulator, mask
    row = (4 * c + kch + ch) * esz + ch * 4 + 4
    if train:
        row += 2 * c * esz          # checkpoint block, double-buffered
    for bt in (4, 2, 1):
        p = bt * r
        chunk = max(p // nc, 1)
        extra = 0
        if train:
            # live dropout keep-scale temporaries (hash + mask, f32)
            extra += 6 * chunk * ch2 * 4
        if mxu3x:
            # bf16 hi/lo of the activation operand per chunk
            extra += 2 * chunk * kch * 2
        if fixed + p * row + extra <= budget:
            return bt
    return 1


def _pack(a: jax.Array, bt: int, r: int) -> jax.Array:
    """[B, T, C] → [B/bt, bt·r, C]: pad each sample's time axis to ``r``
    (zero gap = the conv halo between packed samples) and fold batch into
    the row axis."""
    b, t, c = a.shape
    ap = jnp.pad(a, ((0, 0), (0, r - t), (0, 0)))
    return ap.reshape(b // bt, bt * r, c)


def fused_coupling(
    x_a: jax.Array,
    x_b: jax.Array,
    mask: jax.Array,
    weights: Dict[str, jax.Array],
    cond_bias: jax.Array,
    pitch: Optional[jax.Array] = None,
    *,
    reverse: bool = False,
    batch_tile: Optional[int] = None,
    row_chunks: int = 2,
    stream_weights: Optional[bool] = None,
    mxu3x: Optional[bool] = None,
    interpret: bool = False,
    _skip_shard: bool = False,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """One fused affine-coupling pass.

    Args:
      x_a, x_b: coupling halves ``[B, T, c/2]`` (the WaveNet reads ``x_a``).
      mask: ``[B, T, 1]`` float.
      weights: effective (weight-normed) kernels —
        ``w_start [c/2, ch]``, ``b_start [ch]``,
        ``w_in [n, k, ch, 2ch]``, ``w_rs [n, ch, 2ch]``, ``b_rs [n, 2ch]``
        (last layer's res half zero-padded),
        ``w_end [ch, c]``, ``b_end [c]``,
        optional ``w_pitch [n, ps, 2ch]``.
      cond_bias: ``[n, B, 2ch]`` per-layer additive bias — the in-conv bias
        plus any global speaker/prosody projections (their biases folded in).
      pitch: optional time-varying conditioning ``[B, T, ps]`` (GR mode).
      reverse: inverse-flow direction (inference).

    Returns ``(z_b [B, T, c/2], logdet [B] float32 | None)``.
    """
    b, t, c2 = x_a.shape
    if not _skip_shard:
        # under an ambient mesh, run per-device on the batch shard — the
        # pallas custom-call is opaque to GSPMD and would otherwise be
        # computed on gathered operands (see parallel/mesh.py)
        from glow_tts_tpu.parallel import mesh as mesh_lib
        mesh = mesh_lib.active_data_mesh(b)
        if mesh is not None:
            from jax.sharding import PartitionSpec as P
            wkeys = sorted(weights)
            has_pitch_ = pitch is not None

            def inner(xa_, xb_, m_, cond_, *rest):
                pitch_ = rest[0] if has_pitch_ else None
                w_ = dict(zip(wkeys, rest[1 if has_pitch_ else 0:]))
                z, ld = fused_coupling(
                    xa_, xb_, m_, w_, cond_, pitch_, reverse=reverse,
                    batch_tile=batch_tile, row_chunks=row_chunks,
                    stream_weights=stream_weights, mxu3x=mxu3x,
                    interpret=interpret, _skip_shard=True)
                return z if reverse else (z, ld)

            data, rep = P('data'), P()
            in_specs = ((data, data, data, P(None, 'data'))
                        + ((data,) if has_pitch_ else ())
                        + (rep,) * len(wkeys))
            out_specs = data if reverse else (data, data)
            args = ((x_a, x_b, mask, cond_bias)
                    + ((pitch,) if has_pitch_ else ())
                    + tuple(weights[k_] for k_ in wkeys))
            result = mesh_lib.data_shard_map(
                inner, mesh, in_specs=in_specs, out_specs=out_specs)(*args)
            return (result, None) if reverse else result

    dt = x_a.dtype
    n, k, ch, ch2 = weights['w_in'].shape
    if stream_weights is None:
        stream_weights = dt == jnp.float32
    if mxu3x is None:
        # hardware f32 dots need the 3-pass decomposition (the interpreter
        # computes exact f32 — keep it that way for CPU parity tests)
        mxu3x = dt == jnp.float32 and not interpret
    bt = pick_batch_tile(t, k, ch, 2 * c2, dt, n=n, nc=row_chunks,
                         requested=batch_tile)
    pad_t = (k - 1) // 2
    r = t + 2 * pad_t
    p = bt * r

    # pad batch to a multiple of the tile (mask zero → logdet zero)
    b_pad = (-b) % bt
    if b_pad:
        pad3 = ((0, b_pad), (0, 0), (0, 0))
        x_a, x_b, mask = (jnp.pad(a, pad3) for a in (x_a, x_b, mask))
        cond_bias = jnp.pad(cond_bias, ((0, 0), (0, b_pad), (0, 0)))
        if pitch is not None:
            pitch = jnp.pad(pitch, pad3)
    bp = b + b_pad
    nb = bp // bt

    xa_p = _pack(x_a, bt, r)
    xb_p = _pack(x_b, bt, r)
    m_p = _pack(mask.astype(jnp.float32), bt, r)
    # [n, B, 2ch] → [nb, n, bt, 2ch], grouping consecutive samples
    cond_p = (cond_bias.transpose(1, 0, 2)
              .reshape(nb, bt, n, ch2).transpose(0, 2, 1, 3).astype(dt))
    ind = jnp.repeat(jnp.eye(bt, dtype=dt), r, axis=0)           # [P, bt]

    has_pitch = pitch is not None
    w_space = pl.ANY if stream_weights else pltpu.VMEM
    vm = pltpu.VMEM

    def vspec(block, index_map=None):
        return pl.BlockSpec(block, index_map, memory_space=vm)

    whole = pl.BlockSpec(memory_space=vm)
    in_specs = [
        vspec((1, p, c2), lambda i: (i, 0, 0)),                  # x_a
        vspec((1, p, c2), lambda i: (i, 0, 0)),                  # x_b
        vspec((1, p, 1), lambda i: (i, 0, 0)),                   # mask
        whole,                                                   # indicator
        vspec((1, n, bt, ch2), lambda i: (i, 0, 0, 0)),          # cond
        whole, whole,                                            # w/b start
        pl.BlockSpec(memory_space=w_space),                      # w_in
        pl.BlockSpec(memory_space=w_space),                      # w_rs
        whole, whole, whole,                                     # b_rs, w/b end
    ]
    operands = [
        xa_p, xb_p, m_p, ind, cond_p,
        weights['w_start'].astype(dt),
        weights['b_start'].astype(jnp.float32).reshape(1, -1),
        weights['w_in'].astype(dt).reshape(n, k * ch, ch2),   # im2col layout
        weights['w_rs'].astype(dt),
        weights['b_rs'].astype(jnp.float32),
        weights['w_end'].astype(dt),
        weights['b_end'].astype(jnp.float32).reshape(1, -1),
    ]
    if has_pitch:
        ps = pitch.shape[-1]
        in_specs += [vspec((1, p, ps), lambda i: (i, 0, 0)), whole]
        operands += [_pack(pitch.astype(dt), bt, r),
                     weights['w_pitch'].astype(dt)]

    out_shape = [jax.ShapeDtypeStruct((nb, p, c2), dt)]
    out_specs = [vspec((1, p, c2), lambda i: (i, 0, 0))]
    if not reverse:
        out_shape.append(jax.ShapeDtypeStruct((nb, bt), jnp.float32))
        out_specs.append(pl.BlockSpec((nb, bt), lambda i: (0, 0),
                                      memory_space=pltpu.SMEM))

    scratch = [pltpu.VMEM((p + 2 * pad_t, ch), dt),
               pltpu.VMEM((p, k * ch), dt),          # im2col columns
               pltpu.VMEM((p, ch), jnp.float32)]     # skip accumulator
    if stream_weights:
        scratch += [pltpu.VMEM((2, k * ch, ch2), dt),
                    pltpu.VMEM((2, ch, ch2), dt),
                    pltpu.SemaphoreType.DMA((2, 2))]

    kernel = _make_kernel(n, k, ch, c2, bt, r, t, p, reverse, has_pitch,
                          stream_weights, nc=row_chunks, mxu3x=mxu3x)
    results = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=in_specs,
        out_shape=out_shape,
        out_specs=out_specs,
        scratch_shapes=scratch,
        interpret=interpret,
    )(*operands)

    z_b = results[0].reshape(bp, r, c2)[:b, :t]
    if reverse:
        return z_b, None
    logdet = results[1].reshape(bp)[:b]
    return z_b, logdet


def fused_flow_step(
    x: jax.Array,
    mask: jax.Array,
    weights: Dict[str, jax.Array],
    cond_bias: jax.Array,
    pitch: Optional[jax.Array] = None,
    *,
    reverse: bool = False,
    batch_tile: Optional[int] = None,
    row_chunks: int = 2,
    stream_weights: Optional[bool] = None,
    mxu3x: Optional[bool] = None,
    interpret: bool = False,
    _skip_shard: bool = False,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """One fused FLOW STEP: ActNorm → invertible 1×1 → affine coupling
    (reverse order on the inverse pass) in a single pallas_call.

    On top of the :func:`fused_coupling` weight dict, ``weights`` carries:
      ``an_logs [C]``, ``an_bias [C]`` — ActNorm parameters (fp32);
      ``mix_t [C, C]`` — the TRANSPOSED block-sparse channel-mixing matrix
        (forward: mixing.T; reverse: inv(mixing).T), built by the caller
        from the invertible-conv weight (``models/decoder.py``);
      ``ld_const`` — scalar fp32: ``sum(an_logs) + logabsdet(W)·(C/split)``,
        the per-valid-frame logdet of the two folded layers (forward only).

    Returns ``(z [B, T, C], logdet [B] | None)`` — the complete flow-step
    output including the pass-through half.
    """
    b, t, c = x.shape
    if not _skip_shard:
        from glow_tts_tpu.parallel import mesh as mesh_lib
        mesh = mesh_lib.active_data_mesh(b)
        if mesh is not None:
            from jax.sharding import PartitionSpec as P
            wkeys = sorted(weights)
            has_pitch_ = pitch is not None

            def inner(x_, m_, cond_, *rest):
                pitch_ = rest[0] if has_pitch_ else None
                w_ = dict(zip(wkeys, rest[1 if has_pitch_ else 0:]))
                z, ld = fused_flow_step(
                    x_, m_, w_, cond_, pitch_, reverse=reverse,
                    batch_tile=batch_tile, row_chunks=row_chunks,
                    stream_weights=stream_weights, mxu3x=mxu3x,
                    interpret=interpret, _skip_shard=True)
                return z if reverse else (z, ld)

            data, rep = P('data'), P()
            in_specs = ((data, data, P(None, 'data'))
                        + ((data,) if has_pitch_ else ())
                        + (rep,) * len(wkeys))
            out_specs = data if reverse else (data, data)
            args = ((x, mask, cond_bias)
                    + ((pitch,) if has_pitch_ else ())
                    + tuple(weights[k_] for k_ in wkeys))
            result = mesh_lib.data_shard_map(
                inner, mesh, in_specs=in_specs, out_specs=out_specs)(*args)
            return (result, None) if reverse else result

    dt = x.dtype
    c2 = c // 2
    n, k, ch, ch2 = weights['w_in'].shape
    if stream_weights is None:
        stream_weights = dt == jnp.float32
    if mxu3x is None:
        mxu3x = dt == jnp.float32 and not interpret
    bt = pick_batch_tile(t, k, ch, c, dt, n=n, nc=row_chunks,
                         requested=batch_tile)
    pad_t = (k - 1) // 2
    r = t + 2 * pad_t
    p = bt * r

    b_pad = (-b) % bt
    if b_pad:
        pad3 = ((0, b_pad), (0, 0), (0, 0))
        x, mask = jnp.pad(x, pad3), jnp.pad(mask, pad3)
        cond_bias = jnp.pad(cond_bias, ((0, 0), (0, b_pad), (0, 0)))
        if pitch is not None:
            pitch = jnp.pad(pitch, pad3)
    bp = b + b_pad
    nb = bp // bt

    x_p = _pack(x, bt, r)
    m_p = _pack(mask.astype(jnp.float32), bt, r)
    cond_p = (cond_bias.transpose(1, 0, 2)
              .reshape(nb, bt, n, ch2).transpose(0, 2, 1, 3).astype(dt))
    ind = jnp.repeat(jnp.eye(bt, dtype=dt), r, axis=0)

    has_pitch = pitch is not None
    w_space = pl.ANY if stream_weights else pltpu.VMEM
    vm = pltpu.VMEM

    def vspec(block, index_map=None):
        return pl.BlockSpec(block, index_map, memory_space=vm)

    whole = pl.BlockSpec(memory_space=vm)
    an = jnp.stack([weights['an_logs'].astype(jnp.float32),
                    weights['an_bias'].astype(jnp.float32)])       # [2, C]
    in_specs = [
        vspec((1, p, c), lambda i: (i, 0, 0)),                     # x
        vspec((1, p, 1), lambda i: (i, 0, 0)),                     # mask
        whole,                                                     # indicator
        vspec((1, n, bt, ch2), lambda i: (i, 0, 0, 0)),            # cond
        whole, whole,                                              # an, mix_t
    ]
    operands = [x_p, m_p, ind, cond_p, an, weights['mix_t'].astype(dt)]
    if not reverse:
        in_specs.append(pl.BlockSpec((1, 1), lambda i: (0, 0),
                                     memory_space=pltpu.SMEM))
        operands.append(
            jnp.asarray(weights['ld_const'],
                        jnp.float32).reshape(1, 1))
    in_specs += [
        whole, whole,                                              # w/b start
        pl.BlockSpec(memory_space=w_space),                        # w_in
        pl.BlockSpec(memory_space=w_space),                        # w_rs
        whole, whole, whole,                                       # b_rs, end
    ]
    operands += [
        weights['w_start'].astype(dt),
        weights['b_start'].astype(jnp.float32).reshape(1, -1),
        weights['w_in'].astype(dt).reshape(n, k * ch, ch2),
        weights['w_rs'].astype(dt),
        weights['b_rs'].astype(jnp.float32),
        weights['w_end'].astype(dt),
        weights['b_end'].astype(jnp.float32).reshape(1, -1),
    ]
    if has_pitch:
        ps = pitch.shape[-1]
        in_specs += [vspec((1, p, ps), lambda i: (i, 0, 0)), whole]
        operands += [_pack(pitch.astype(dt), bt, r),
                     weights['w_pitch'].astype(dt)]

    out_shape = [jax.ShapeDtypeStruct((nb, p, c), dt)]
    out_specs = [vspec((1, p, c), lambda i: (i, 0, 0))]
    if not reverse:
        out_shape.append(jax.ShapeDtypeStruct((nb, bt), jnp.float32))
        out_specs.append(pl.BlockSpec((nb, bt), lambda i: (0, 0),
                                      memory_space=pltpu.SMEM))

    scratch = [pltpu.VMEM((p + 2 * pad_t, ch), dt),
               pltpu.VMEM((p, k * ch), dt),
               pltpu.VMEM((p, ch), jnp.float32)]
    if stream_weights:
        scratch += [pltpu.VMEM((2, k * ch, ch2), dt),
                    pltpu.VMEM((2, ch, ch2), dt),
                    pltpu.SemaphoreType.DMA((2, 2))]

    kernel = _make_kernel(n, k, ch, c2, bt, r, t, p, reverse, has_pitch,
                          stream_weights, flowstep=True, nc=row_chunks,
                          mxu3x=mxu3x)
    results = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=in_specs,
        out_shape=out_shape,
        out_specs=out_specs,
        scratch_shapes=scratch,
        interpret=interpret,
    )(*operands)

    z = results[0].reshape(bp, r, c)[:b, :t]
    if reverse:
        return z, None
    return z, results[1].reshape(bp)[:b]


def fused_flow_stack(
    x: jax.Array,
    mask: jax.Array,
    weights: Dict[str, jax.Array],
    cond_bias: jax.Array,
    pitch: Optional[jax.Array] = None,
    *,
    reverse: bool = False,
    batch_tile: Optional[int] = None,
    row_chunks: int = 2,
    stream_weights: Optional[bool] = None,
    mxu3x: Optional[bool] = None,
    interpret: bool = False,
    _skip_shard: bool = False,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """The WHOLE flow decoder stack (``S`` × ActNorm → inv-1×1 → coupling;
    reversed order on the inverse pass) as ONE pallas_call — the 12-step
    megakernel.  Reference hot loop: ``Modules.py:298-309,858-883``.

    ``weights`` is the :func:`fused_flow_step` dict with every array
    stacked along a leading flow-step axis ``S`` (``ld_const`` becomes
    ``[S]``); ``cond_bias`` is ``[S, n, B, 2ch]``.  Activations stay
    VMEM-resident across all ``S`` steps (one HBM write per batch block
    instead of ``S``), and each step's weights are streamed by Mosaic's
    automatic block double-buffering over the grid's flow axis.

    f32 activations run every dot through the in-kernel bf16_3x
    decomposition (module header) with the big weight stacks manually
    DMA-streamed per (step, layer) — their f32 BlockSpec blocks would not
    fit VMEM next to the f32 im2col scratch.

    Returns ``(z [B, T, C], logdet [B] float32 | None)``.
    """
    b, t, c = x.shape
    if not _skip_shard:
        from glow_tts_tpu.parallel import mesh as mesh_lib
        mesh = mesh_lib.active_data_mesh(b)
        if mesh is not None:
            from jax.sharding import PartitionSpec as P
            wkeys = sorted(weights)
            has_pitch_ = pitch is not None

            def inner(x_, m_, cond_, *rest):
                pitch_ = rest[0] if has_pitch_ else None
                w_ = dict(zip(wkeys, rest[1 if has_pitch_ else 0:]))
                z, ld = fused_flow_stack(
                    x_, m_, w_, cond_, pitch_, reverse=reverse,
                    batch_tile=batch_tile, row_chunks=row_chunks,
                    stream_weights=stream_weights, mxu3x=mxu3x,
                    interpret=interpret, _skip_shard=True)
                return z if reverse else (z, ld)

            data, rep = P('data'), P()
            in_specs = ((data, data, P(None, None, 'data'))
                        + ((data,) if has_pitch_ else ())
                        + (rep,) * len(wkeys))
            out_specs = data if reverse else (data, data)
            args = ((x, mask, cond_bias)
                    + ((pitch,) if has_pitch_ else ())
                    + tuple(weights[k_] for k_ in wkeys))
            result = mesh_lib.data_shard_map(
                inner, mesh, in_specs=in_specs, out_specs=out_specs)(*args)
            return (result, None) if reverse else result

    dt = x.dtype
    c2 = c // 2
    s_steps, n, k, ch, ch2 = weights['w_in'].shape
    if stream_weights is None:
        stream_weights = dt == jnp.float32
    if mxu3x is None:
        mxu3x = dt == jnp.float32 and not interpret
    bt = pick_batch_tile(t, k, ch, c, dt, n=n, nc=row_chunks,
                         requested=batch_tile)
    pad_t = (k - 1) // 2
    r = t + 2 * pad_t
    p = bt * r

    b_pad = (-b) % bt
    if b_pad:
        pad3 = ((0, b_pad), (0, 0), (0, 0))
        x, mask = jnp.pad(x, pad3), jnp.pad(mask, pad3)
        cond_bias = jnp.pad(cond_bias, ((0, 0), (0, 0), (0, b_pad), (0, 0)))
        if pitch is not None:
            pitch = jnp.pad(pitch, pad3)
    bp = b + b_pad
    nb = bp // bt

    x_p = _pack(x, bt, r)
    m_p = _pack(mask.astype(jnp.float32), bt, r)
    # [S, n, B, 2ch] → [nb, S, n, bt, 2ch], grouping consecutive samples
    cond_p = (cond_bias.transpose(2, 0, 1, 3)
              .reshape(nb, bt, s_steps, n, ch2)
              .transpose(0, 2, 3, 1, 4).astype(dt))
    ind = jnp.repeat(jnp.eye(bt, dtype=dt), r, axis=0)           # [P, bt]

    has_pitch = pitch is not None
    vm = pltpu.VMEM

    # the flow axis: j-th grid step runs flow step j (forward) or
    # S-1-j (inverse) — the index maps express the order, the kernel
    # body is direction-agnostic about it
    if reverse:
        def step_ix(_, j):
            return s_steps - 1 - j
    else:
        def step_ix(_, j):
            return j

    def bspec(block, index_map, space=vm):
        return pl.BlockSpec(block, index_map, memory_space=space)

    whole = pl.BlockSpec(memory_space=vm)
    an = jnp.stack([weights['an_logs'].astype(jnp.float32),
                    weights['an_bias'].astype(jnp.float32)],
                   axis=1)                                       # [S, 2, C]
    in_specs = [
        bspec((1, p, c), lambda i, j: (i, 0, 0)),                # x
        bspec((1, p, 1), lambda i, j: (i, 0, 0)),                # mask
        whole,                                                   # indicator
        bspec((1, 1, n, bt, ch2),
              lambda i, j: (i, step_ix(i, j), 0, 0, 0)),         # cond
        bspec((1, 2, c), lambda i, j: (step_ix(i, j), 0, 0)),    # an
        bspec((1, c, c), lambda i, j: (step_ix(i, j), 0, 0)),    # mix_t
    ]
    operands = [x_p, m_p, ind, cond_p, an, weights['mix_t'].astype(dt)]
    if not reverse:
        # whole-array SMEM block: Mosaic requires the last two block dims
        # divisible by (8, 128) or equal to the array dims — a per-step
        # (1, 1) block over [S, 1] fails lowering; the kernel indexes by j
        in_specs.append(bspec((s_steps, 1), lambda i, j: (0, 0),
                              space=pltpu.SMEM))
        operands.append(
            jnp.asarray(weights['ld_const'], jnp.float32).reshape(-1, 1))
    if stream_weights:
        # the big weight stacks stay whole in HBM; the kernel DMA-streams
        # them per (step, layer) into double buffers
        win_spec = pl.BlockSpec(memory_space=pl.ANY)
        wrs_spec = pl.BlockSpec(memory_space=pl.ANY)
    else:
        win_spec = bspec((1, n, k * ch, ch2),
                         lambda i, j: (step_ix(i, j), 0, 0, 0))
        wrs_spec = bspec((1, n, ch, ch2),
                         lambda i, j: (step_ix(i, j), 0, 0, 0))
    in_specs += [
        bspec((1, c2, ch), lambda i, j: (step_ix(i, j), 0, 0)),     # w_start
        bspec((1, 1, ch), lambda i, j: (step_ix(i, j), 0, 0)),      # b_start
        win_spec,                                                   # w_in
        wrs_spec,                                                   # w_rs
        bspec((1, n, ch2), lambda i, j: (step_ix(i, j), 0, 0)),     # b_rs
        bspec((1, ch, c), lambda i, j: (step_ix(i, j), 0, 0)),      # w_end
        bspec((1, 1, c), lambda i, j: (step_ix(i, j), 0, 0)),       # b_end
    ]
    operands += [
        weights['w_start'].astype(dt),
        weights['b_start'].astype(jnp.float32).reshape(s_steps, 1, -1),
        weights['w_in'].astype(dt).reshape(s_steps, n, k * ch, ch2),
        weights['w_rs'].astype(dt),
        weights['b_rs'].astype(jnp.float32),
        weights['w_end'].astype(dt),
        weights['b_end'].astype(jnp.float32).reshape(s_steps, 1, -1),
    ]
    if has_pitch:
        ps = pitch.shape[-1]
        in_specs += [bspec((1, p, ps), lambda i, j: (i, 0, 0)),
                     bspec((1, n, ps, ch2),
                           lambda i, j: (step_ix(i, j), 0, 0, 0))]
        operands += [_pack(pitch.astype(dt), bt, r),
                     weights['w_pitch'].astype(dt)]

    out_shape = [jax.ShapeDtypeStruct((nb, p, c), dt)]
    # constant-in-j index map → the output block doubles as the VMEM
    # carry across the flow stack (revisiting semantics)
    out_specs = [bspec((1, p, c), lambda i, j: (i, 0, 0))]
    if not reverse:
        out_shape.append(jax.ShapeDtypeStruct((nb, bt), jnp.float32))
        out_specs.append(pl.BlockSpec((nb, bt), lambda i, j: (0, 0),
                                      memory_space=pltpu.SMEM))

    scratch = [pltpu.VMEM((p + 2 * pad_t, ch), dt),
               pltpu.VMEM((p, k * ch), dt),          # im2col columns
               pltpu.VMEM((p, ch), jnp.float32)]     # skip accumulator
    if stream_weights:
        scratch += [pltpu.VMEM((2, k * ch, ch2), dt),
                    pltpu.VMEM((2, ch, ch2), dt),
                    pltpu.SemaphoreType.DMA((2, 2))]

    kernel = _make_mega_kernel(n, k, ch, c2, bt, r, t, p, s_steps, reverse,
                               has_pitch, nc=row_chunks, mxu3x=mxu3x,
                               stream=stream_weights)
    results = pl.pallas_call(
        kernel,
        grid=(nb, s_steps),
        in_specs=in_specs,
        out_shape=out_shape,
        out_specs=out_specs,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary', 'arbitrary')),
        interpret=interpret,
    )(*operands)

    z = results[0].reshape(bp, r, c)[:b, :t]
    if reverse:
        return z, None
    return z, results[1].reshape(bp)[:b]
