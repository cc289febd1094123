"""Train-direction fused flow-stack megakernel with a Pallas backward pass.

``ops/coupling.py``'s ``fused_flow_stack`` runs the whole 12-step Glow
decoder (reference ``Modules.py:298-309,858-883``) as one deterministic
Pallas call.  Training could not use it: the WaveNet applies dropout to
each in-conv output (``Modules.py:854-862``), and XLA's autodiff of the
flax path shatters the backward pass into hundreds of ~70 µs fusions —
the measured v5e train step (23.4 ms, MFU 0.389) is dominated by that
long tail, not by any single hot op.

This module closes both gaps:

* :func:`fused_flow_stack_train` — the forward megakernel extended with
  in-kernel dropout (``ops/dropmask.py``: a portable counter-hash mask,
  applied to conv-output+bias BEFORE the conditioning adds, matching the
  reference order) and a per-step activation checkpoint written to HBM
  (one ``[S, B, r, C]`` tensor — the only extra memory training needs).

* a hand-written **backward megakernel** under ``jax.custom_vjp``: grid
  ``(batch blocks, flow steps)`` with the flow axis reversed, the
  activation cotangent carried across steps in a revisited VMEM output
  block, each step recomputing its WaveNet from the checkpoint
  (ascending) and backpropagating (descending) entirely in VMEM.
  Per-batch-block weight gradients are written to HBM and reduced
  outside the kernel (nb small partial sums — XLA fuses the reduction).
  Dropout masks are regenerated from the same ``(seed, step, layer,
  sample·r+τ, channel)`` hash, so forward/backward agree bit-wise with
  no stored masks.

Numerical policy mirrors the repo rules: fp32 accumulation in every
dot, fp32 for the log-determinant and all reductions; bf16 weight
gradients are rounded once per batch block and summed in fp32 (the flax
path's grads carry bf16 dot noise of the same order).  f32 activations
run the 3-pass bf16 decomposition (``coupling._mk_dot``).

The differentiable pure-JAX twin :func:`flow_stack_train_reference`
reproduces the kernel's exact semantics (including the hash dropout
masks) and serves as the gradient oracle for the parity tests
(``tests/test_coupling_train.py``).

VMEM note: the backward kernel defaults to ``batch_tile=2`` (vs the
forward's 4) and manually DMA-streams the large in-conv weight stacks
and the dWin gradient write-back — the double-buffered BlockSpec blocks
would not fit the ~16 MB VMEM beside the recompute scratch.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from glow_tts_tpu.ops import dropmask
from glow_tts_tpu.ops.coupling import (_chunks, _coupling_body, _mk_dot,
                                       _pack)


def _mk_dot_dims(mxu3x: bool, dims):
    """Like :func:`coupling._mk_dot` but for an arbitrary contraction —
    the backward pass needs ``aᵀ·b`` (contract dim 0 with dim 0) and
    ``a·bᵀ`` (dim 1 with dim 1) without materialising transposes."""
    dn = (dims, ((), ()))

    # precision pinned to DEFAULT for the same reason as coupling._mk_dot:
    # an ambient 'highest' scope makes Mosaic emit contract_precision<fp32>
    # on bf16 operands, which fails its matmul lowering ('Bad lhs type')
    def dot1(a, b):
        return jax.lax.dot_general(a, b, dn,
                                   preferred_element_type=jnp.float32,
                                   precision=jax.lax.Precision.DEFAULT)

    if not mxu3x:
        return dot1

    def dot3(a, b):
        a = a.astype(jnp.float32)
        b = b.astype(jnp.float32)
        ah = a.astype(jnp.bfloat16)
        al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
        bh = b.astype(jnp.bfloat16)
        bl = (b - bh.astype(jnp.float32)).astype(jnp.bfloat16)
        return dot1(ah, bh) + dot1(ah, bl) + dot1(al, bh)

    return dot3


# ---------------------------------------------------------------------------
# forward kernel (train direction only: forward flow, logdet, dropout, ckpt)
# ---------------------------------------------------------------------------


def _make_train_fwd_kernel(n, k, ch, c2, bt, r, t, p, s_steps, rate,
                           has_cond, has_pitch, nc, mxu3x, stream):
    pad = (k - 1) // 2
    ch2 = 2 * ch
    dot = _mk_dot(mxu3x)

    def kernel(*refs):
        it = iter(refs)
        x_ref, m_ref, ind = (next(it) for _ in range(3))
        an, mix, bin_ = (next(it) for _ in range(3))
        cond = next(it) if has_cond else None
        ws, bs, w_in, w_rs, brs, we, be = (next(it) for _ in range(7))
        if has_pitch:
            pit, wp = next(it), next(it)
        seed = next(it)
        zb, ld, ckpt = (next(it) for _ in range(3))
        xp, xi, out_s = (next(it) for _ in range(3))
        if stream:
            win_buf, wrs_buf, sems = next(it), next(it), next(it)

        gi = pl.program_id(0)
        j = pl.program_id(1)
        dt = x_ref.dtype
        m = m_ref[0]

        stream_ctl = None
        if stream:
            def dma_in(i, slot):
                return pltpu.make_async_copy(
                    w_in.at[j, i], win_buf.at[slot], sems.at[0, slot])

            def dma_rs(i, slot):
                return pltpu.make_async_copy(
                    w_rs.at[j, i], wrs_buf.at[slot], sems.at[1, slot])

            dma_in(0, 0).start()
            dma_rs(0, 0).start()

            def stream_ctl(i):
                if i + 1 < n:
                    dma_in(i + 1, (i + 1) % 2).start()
                    dma_rs(i + 1, (i + 1) % 2).start()
                dma_in(i, i % 2).wait()
                dma_rs(i, i % 2).wait()

        @pl.when(j == 0)
        def _seed():
            zb[0] = x_ref[0]
            for bi in range(bt):
                ld[gi, bi] = 0.0

        xcur = zb[0]
        ckpt[0, 0] = xcur        # the input of flow step j — bwd restarts here

        xv = xcur.astype(jnp.float32)
        y = (an[0, 1][None, :] + jnp.exp(an[0, 0])[None, :] * xv) * m
        yd = dot(y.astype(dt), mix[0]) * m
        xa_v = yd[:, :c2].astype(dt)
        xbv = yd[:, c2:]

        get_drop = None
        get_cond = (lambda i: cond[0, 0, i]) if has_cond else None

        def get_bin(i):
            return bin_[0, i][None, :]

        if rate > 0.0:
            def get_drop(i, o, L):
                salt = dropmask.layer_salt(seed[0, 0], j, i, n)
                return dropmask.keep_scale(salt, gi * p + o, (L, ch2),
                                           ch2, rate)

        z, logs = _coupling_body(
            xa_v, xbv, m, dt, n, k, ch, c2, p, pad, _chunks(p, nc),
            ws[0], bs[0, 0],
            (lambda i: win_buf[i % 2]) if stream else (lambda i: w_in[0, i]),
            (lambda i: wrs_buf[i % 2]) if stream else (lambda i: w_rs[0, i]),
            lambda i: brs[0, i], get_cond,
            we[0], be[0, 0], ind, xp, xi, out_s,
            pit_v=pit[0] if has_pitch else None,
            get_wp=(lambda i: wp[0, i]) if has_pitch else None,
            reverse=False, stream_ctl=stream_ctl, dot=dot,
            get_bin=get_bin, get_drop=get_drop)

        zb[0] = jnp.concatenate(
            [xa_v.astype(jnp.float32), z], axis=1).astype(dt)
        lm = logs * m
        for bi in range(bt):
            ld[gi, bi] = ld[gi, bi] + jnp.sum(lm[bi * r:bi * r + t])

    return kernel


# ---------------------------------------------------------------------------
# backward kernel
# ---------------------------------------------------------------------------


def _make_train_bwd_kernel(n, k, ch, c2, bt, r, t, p, s_steps, rate,
                           has_cond, has_pitch, ps, mxu3x):
    """Grid ``(nb, S)``; grid step ``(gi, j)`` backprops flow step
    ``sj = S−1−j`` for batch block ``gi``.  ``ckpt_fold`` = forward
    batch_tile / backward batch_tile: the checkpoint array keeps the
    forward packing, so block ``gi`` reads fold-block ``gi // ckpt_fold``
    sub-block ``gi % ckpt_fold`` (expressed in the BlockSpec index map,
    no repack pass).

    Phases per grid step (everything VMEM-resident):
      1. ascending WaveNet recompute from the checkpoint, storing only
         the padded per-layer inputs;
      2. affine/logdet epilogue backward;
      3. descending per-layer backward — each layer's activation
         gradient, conv-transpose (tap-wise matmuls against the padded
         inputs), weight gradients (dWin DMA-written to HBM from a
         double buffer);
      4. 1×1-mixing and ActNorm backward; the input cotangent replaces
         the carried block.
    """
    pad = (k - 1) // 2
    ch2 = 2 * ch
    c = 2 * c2
    dot = _mk_dot(mxu3x)
    dotT = _mk_dot_dims(mxu3x, ((0,), (0,)))    # aᵀ·b
    dotN = _mk_dot_dims(mxu3x, ((1,), (1,)))    # a·bᵀ

    def kernel(*refs):
        it = iter(refs)
        ckpt, dz, dld, m_ref, ind = (next(it) for _ in range(5))
        an, mix, bin_ = (next(it) for _ in range(3))
        cond = next(it) if has_cond else None
        ws, bs, w_in, w_rs, brs, we, be = (next(it) for _ in range(7))
        if has_pitch:
            pit, wp = next(it), next(it)
        seed = next(it)
        # outputs
        dx = next(it)
        dws, dbs, dwin_hbm, dwrs, dbrs, dwe, dbe = (
            next(it) for _ in range(7))
        dan, dmix, dbin = (next(it) for _ in range(3))
        dcond = next(it) if has_cond else None
        if has_pitch:
            dpit, dwp = next(it), next(it)
        # scratch
        xin_s, skip_s, dxin_s, dsk_s, dxp = (next(it) for _ in range(5))
        win_buf, win_sems, gw_buf, gw_sems = (next(it) for _ in range(4))

        gi = pl.program_id(0)
        j = pl.program_id(1)
        sj = s_steps - 1 - j
        dt = ckpt.dtype
        m = m_ref[0]                                    # [p, 1] f32

        # ---- manual DMA for the big in-conv weight stack: one slot per
        # layer, fetched ONCE per grid step — the ascending recompute
        # consumes them as they land and the descending grad loop reads
        # the already-resident buffers (n slots cost the same VMEM as
        # one Mosaic-double-buffered BlockSpec block and halve the
        # dominant weight traffic of the backward pass)
        def dma_win(i):
            return pltpu.make_async_copy(
                w_in.at[sj, i], win_buf.at[i], win_sems.at[i])

        def dma_gw(i, slot):
            return pltpu.make_async_copy(
                gw_buf.at[slot], dwin_hbm.at[gi, sj, i], gw_sems.at[slot])

        @pl.when(j == 0)
        def _seed_carries():
            dx[0] = dz[0].astype(jnp.float32)
            if has_pitch:
                dpit[0] = jnp.zeros((p, ps), jnp.float32)
            # zero the halo rows of the recompute scratch once; interiors
            # are overwritten every step
            xin_s[...] = jnp.zeros((n, p + 2 * pad, ch), dt)

        carry = dx[0]                                   # [p, c] f32

        def keep(i, o, L):
            salt = dropmask.layer_salt(seed[0, 0], sj, i, n)
            return dropmask.keep_scale(salt, gi * p + o, (L, ch2),
                                       ch2, rate)

        # ================= phase 1: ascending recompute =================
        for li in range(n):
            dma_win(li).start()
        x_in = ckpt[0, 0, 0]                            # [p, c] dt
        xf = x_in.astype(jnp.float32)
        el_an = jnp.exp(an[0, 0])[None, :]
        y = (an[0, 1][None, :] + el_an * xf) * m        # f32
        yv = y.astype(dt)
        yd = dot(yv, mix[0]) * m                        # f32 [p, c]
        xa = yd[:, :c2].astype(dt)
        xbf = yd[:, c2:]
        h = (dot(xa, ws[0]) + bs[0, 0][None, :]) * m    # f32 [p, ch]
        xin_s[0, pad:pad + p] = h.astype(dt)
        skip_s[...] = jnp.zeros((p, ch), jnp.float32)

        def layer_acc(i, slot):
            """Recompute layer ``i``'s pre-gate activations from the
            stored padded input (tap-wise conv matmuls)."""
            acc = dot(xin_s[i, 0:p], win_buf[slot, 0:ch])
            for d in range(1, k):
                acc += dot(xin_s[i, d:d + p], win_buf[slot,
                                                      d * ch:(d + 1) * ch])
            acc = acc + bin_[0, i][None, :]
            if rate > 0.0:
                acc = acc * keep(i, 0, p)
            if has_cond:
                acc += dot(ind[...], cond[0, 0, i])
            if has_pitch:
                acc += dot(pit[0], wp[0, i])
            return acc

        for i in range(n):
            dma_win(i).wait()
            acc = layer_acc(i, i)
            t_ = jnp.tanh(acc[:, :ch])
            s_ = jax.nn.sigmoid(acc[:, ch:])
            g = (t_ * s_).astype(dt)
            rs = dot(g, w_rs[0, i]) + brs[0, i][None, :]
            if i < n - 1:
                nxt = ((xin_s[i, pad:pad + p].astype(jnp.float32)
                        + rs[:, :ch]) * m).astype(dt)
                xin_s[i + 1, pad:pad + p] = nxt
            skip_s[...] = skip_s[...] + rs[:, ch:]

        # ================= phase 2: epilogue backward =================
        out = skip_s[...] * m                           # f32 [p, ch]
        out_v = out.astype(dt)
        outs = dot(out_v, we[0]) + be[0, 0][None, :]    # f32 [p, c]
        logs = outs[:, c2:]
        elogs = jnp.exp(logs)

        dxa_pass = carry[:, :c2]
        dzb_m = carry[:, c2:] * m
        dxb = dzb_m * elogs
        dlogs = dzb_m * elogs * xbf
        # + the logdet cotangent (per-sample scalar) on the valid rows
        dlogs = jnp.concatenate(
            [dlogs[bi * r:(bi + 1) * r]
             + dld[gi, bi] * m[bi * r:(bi + 1) * r]
             for bi in range(bt)], axis=0)
        douts = jnp.concatenate([dzb_m, dlogs], axis=1)  # [p, c] f32
        douts_v = douts.astype(dt)
        dwe[0, 0] = dotT(out_v, douts_v)
        dbe[0, 0] = jnp.sum(douts, axis=0, keepdims=True)
        dsk_s[...] = dotN(douts_v, we[0]) * m            # dskip, f32

        # ================= phase 3: descending layer backward ==========
        # dWin write-back: gw_buf slot i%2 → HBM; before reusing a slot,
        # wait for the copy issued two layers later (same slot).
        # w_in buffers are still resident from phase 1 — no re-fetch.
        for i in range(n - 1, -1, -1):
            slot = i
            acc = layer_acc(i, slot)
            t_ = jnp.tanh(acc[:, :ch])
            s_ = jax.nn.sigmoid(acc[:, ch:])
            g = (t_ * s_).astype(dt)
            if i < n - 1:
                res_grad = dxin_s[...] * m               # f32 [p, ch]
            else:
                res_grad = jnp.zeros((p, ch), jnp.float32)
            drs = jnp.concatenate([res_grad, dsk_s[...]], axis=1)
            drs_v = drs.astype(dt)
            dwrs[0, 0, i] = dotT(g, drs_v).astype(dwrs.dtype)
            dbrs[0, 0, i:i + 1] = jnp.sum(drs, axis=0, keepdims=True)
            dg = dotN(drs_v, w_rs[0, i])                 # f32 [p, ch]
            da1 = dg * s_ * (1.0 - t_ * t_)
            da2 = dg * t_ * s_ * (1.0 - s_)
            dacc = jnp.concatenate([da1, da2], axis=1)   # f32 [p, ch2]
            dacc_v = dacc.astype(dt)
            if has_pitch:
                dwp[0, 0, i] = dotT(pit[0], dacc_v)
                dpit[0] = dpit[0] + dotN(dacc_v, wp[0, i])
            if has_cond:
                dcond[0, 0, i] = dotT(ind[...], dacc_v)
            if rate > 0.0:
                dpre = dacc * keep(i, 0, p)
            else:
                dpre = dacc
            dbin[0, 0, i:i + 1] = jnp.sum(dpre, axis=0, keepdims=True)
            dpre_v = dpre.astype(dt)
            # conv-transpose + weight grads, tap by tap
            if i + 2 <= n - 1:
                dma_gw(i + 2, i % 2).wait()   # free this slot
            dxp[...] = jnp.zeros((p + 2 * pad, ch), jnp.float32)
            for d in range(k):
                gw_buf[i % 2, d * ch:(d + 1) * ch] = dotT(
                    xin_s[i, d:d + p], dpre_v).astype(gw_buf.dtype)
                dxp[d:d + p] = dxp[d:d + p] + dotN(
                    dpre_v, win_buf[slot, d * ch:(d + 1) * ch])
            dma_gw(i, i % 2).start()
            dxin_s[...] = dxp[pad:pad + p] + res_grad
        dma_gw(0, 0).wait()
        if n >= 2:
            dma_gw(1, 1).wait()

        # ================= phase 4: start conv, mixing, ActNorm ========
        dh_pre = dxin_s[...] * m                         # [p, ch] f32
        dh_v = dh_pre.astype(dt)
        dws[0, 0] = dotT(xa, dh_v)
        dbs[0, 0] = jnp.sum(dh_pre, axis=0, keepdims=True)
        dxa = dxa_pass + dotN(dh_v, ws[0])
        dyd = jnp.concatenate([dxa, dxb], axis=1) * m    # [p, c] f32
        dyd_v = dyd.astype(dt)
        dmix[0, 0] = dotT(yv, dyd_v)
        dy_m = dotN(dyd_v, mix[0]) * m                   # [p, c] f32
        dan[0, 0, 0:1] = jnp.sum(dy_m * el_an * xf, axis=0, keepdims=True)
        dan[0, 0, 1:2] = jnp.sum(dy_m, axis=0, keepdims=True)
        dx[0] = dy_m * el_an

    return kernel


# ---------------------------------------------------------------------------
# host-side wrappers
# ---------------------------------------------------------------------------


def _prep(x, mask, cond, pitch, bt):
    """Pad batch to the tile, pack rows, build the indicator."""
    b, t, c = x.shape
    b_pad = (-b) % bt
    if b_pad:
        pad3 = ((0, b_pad), (0, 0), (0, 0))
        x, mask = jnp.pad(x, pad3), jnp.pad(mask, pad3)
        if cond is not None:
            cond = jnp.pad(cond, ((0, 0), (0, 0), (0, b_pad), (0, 0)))
        if pitch is not None:
            pitch = jnp.pad(pitch, pad3)
    return x, mask, cond, pitch, b + b_pad


def _pack_cond(cond, nb, bt, dt):
    """[S, n, B, 2ch] → [nb, S, n, bt, 2ch] grouping consecutive samples."""
    s_steps, n, _, ch2 = cond.shape
    return (cond.transpose(2, 0, 1, 3)
            .reshape(nb, bt, s_steps, n, ch2)
            .transpose(0, 2, 3, 1, 4).astype(dt))


def _stack_an(weights):
    return jnp.stack([weights['an_logs'].astype(jnp.float32),
                      weights['an_bias'].astype(jnp.float32)], axis=1)


def _fwd_call(x, mask, weights, cond, pitch, seed, *, rate, bt, nc,
              interpret, mxu3x=None, stream=None):
    """Run the train-forward megakernel.  Returns
    ``(z [B,t,C], ld_wavenet [B] f32, ckpt [nb,S,p,C])``."""
    b, t, c = x.shape
    dt = x.dtype
    c2 = c // 2
    s_steps, n, k, ch, ch2 = weights['w_in'].shape
    if stream is None:
        # Manual per-layer weight streaming beats the BlockSpec route on
        # VMEM whenever it matters: the BlockSpec block is the whole
        # n-layer stack, Mosaic double-buffers it (2n layer weights
        # resident, ~5.6 MB bf16), while the manual DMA keeps 2 single
        # layers (~1.4 MB).  f32 always needs it; bf16 needs it at
        # production length, where the BlockSpec variant OOMs scoped
        # VMEM by 396 KB inside the full train step (16.58 M vs
        # 16.20 M, v5e 2026-08-19 — row-chunking does NOT help: nc=4
        # measured 16.72 M, the stack temporaries are not the
        # dominant term).
        stream = dt == jnp.float32 or t + (k - 1) > 256
    if mxu3x is None:
        mxu3x = dt == jnp.float32 and not interpret
    pad_t = (k - 1) // 2
    r = t + 2 * pad_t
    p = bt * r

    x, mask, cond, pitch, bp = _prep(x, mask, cond, pitch, bt)
    nb = bp // bt
    x_p = _pack(x, bt, r)
    m_p = _pack(mask.astype(jnp.float32), bt, r)
    ind = jnp.repeat(jnp.eye(bt, dtype=dt), r, axis=0)
    has_cond = cond is not None
    has_pitch = pitch is not None

    vm = pltpu.VMEM

    def bspec(block, index_map, space=vm):
        return pl.BlockSpec(block, index_map, memory_space=space)

    whole = pl.BlockSpec(memory_space=vm)
    in_specs = [
        bspec((1, p, c), lambda i, j: (i, 0, 0)),                 # x
        bspec((1, p, 1), lambda i, j: (i, 0, 0)),                 # mask
        whole,                                                    # indicator
        bspec((1, 2, c), lambda i, j: (j, 0, 0)),                 # actnorm
        bspec((1, c, c), lambda i, j: (j, 0, 0)),                 # mix_t
        bspec((1, n, ch2), lambda i, j: (j, 0, 0)),               # b_in
    ]
    operands = [x_p, m_p, ind, _stack_an(weights),
                weights['mix_t'].astype(dt),
                weights['b_in'].astype(jnp.float32)]
    if has_cond:
        in_specs.append(bspec((1, 1, n, bt, ch2),
                              lambda i, j: (i, j, 0, 0, 0)))
        operands.append(_pack_cond(cond, nb, bt, dt))
    if stream:
        win_spec = pl.BlockSpec(memory_space=pl.ANY)
        wrs_spec = pl.BlockSpec(memory_space=pl.ANY)
    else:
        win_spec = bspec((1, n, k * ch, ch2), lambda i, j: (j, 0, 0, 0))
        wrs_spec = bspec((1, n, ch, ch2), lambda i, j: (j, 0, 0, 0))
    in_specs += [
        bspec((1, c2, ch), lambda i, j: (j, 0, 0)),               # w_start
        bspec((1, 1, ch), lambda i, j: (j, 0, 0)),                # b_start
        win_spec, wrs_spec,
        bspec((1, n, ch2), lambda i, j: (j, 0, 0)),               # b_rs
        bspec((1, ch, c), lambda i, j: (j, 0, 0)),                # w_end
        bspec((1, 1, c), lambda i, j: (j, 0, 0)),                 # b_end
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
                     bspec((1, n, ps, ch2), lambda i, j: (j, 0, 0, 0))]
        operands += [_pack(pitch.astype(dt), bt, r),
                     weights['w_pitch'].astype(dt)]
    in_specs.append(pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                                 memory_space=pltpu.SMEM))
    operands.append(jnp.asarray(seed, jnp.int32).reshape(1, 1))

    out_shape = [
        jax.ShapeDtypeStruct((nb, p, c), dt),                     # z carry
        jax.ShapeDtypeStruct((nb, bt), jnp.float32),              # logdet
        jax.ShapeDtypeStruct((nb, s_steps, p, c), dt),            # ckpt
    ]
    out_specs = [
        bspec((1, p, c), lambda i, j: (i, 0, 0)),
        pl.BlockSpec((nb, bt), lambda i, j: (0, 0),
                     memory_space=pltpu.SMEM),
        bspec((1, 1, p, c), lambda i, j: (i, j, 0, 0)),
    ]
    scratch = [pltpu.VMEM((p + 2 * pad_t, ch), dt),
               pltpu.VMEM((p, k * ch), dt),
               pltpu.VMEM((p, ch), jnp.float32)]
    if stream:
        scratch += [pltpu.VMEM((2, k * ch, ch2), dt),
                    pltpu.VMEM((2, ch, ch2), dt),
                    pltpu.SemaphoreType.DMA((2, 2))]

    kernel = _make_train_fwd_kernel(n, k, ch, c2, bt, r, t, p, s_steps,
                                    rate, has_cond, has_pitch, nc, mxu3x,
                                    stream)
    z_p, ld, ckpt = pl.pallas_call(
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

    z = z_p.reshape(bp, r, c)[:b, :t]
    return z, ld.reshape(bp)[:b], ckpt


def _bwd_call(ckpt, dz, dld, mask, weights, cond, pitch, seed, *,
              rate, bt_f, bt, nc, b, t, interpret, mxu3x=None):
    """Run the backward megakernel.  ``dz [B,t,C]``, ``dld [B]``.
    Returns a dict of cotangents (weight grads reduced over batch
    blocks, activations unpacked)."""
    c = dz.shape[-1]
    c2 = c // 2
    dt = ckpt.dtype
    s_steps, n, k, ch, ch2 = weights['w_in'].shape
    if mxu3x is None:
        mxu3x = dt == jnp.float32 and not interpret
    pad_t = (k - 1) // 2
    r = t + 2 * pad_t
    p = bt * r
    assert bt_f % bt == 0
    fold = bt_f // bt

    dz = dz.astype(jnp.float32)
    dz, mask, cond, pitch, bp = _prep(dz, mask, cond, pitch, bt_f)
    dld = jnp.pad(dld.astype(jnp.float32), (0, bp - b))
    nb = bp // bt
    dz_p = _pack(dz, bt, r)
    m_p = _pack(mask.astype(jnp.float32), bt, r)
    ind = jnp.repeat(jnp.eye(bt, dtype=dt), r, axis=0)
    has_cond = cond is not None
    has_pitch = pitch is not None
    gdt = jnp.float32 if dt == jnp.float32 else jnp.bfloat16

    vm = pltpu.VMEM

    def bspec(block, index_map, space=vm):
        return pl.BlockSpec(block, index_map, memory_space=space)

    whole = pl.BlockSpec(memory_space=vm)

    def sj(_, j):
        return s_steps - 1 - j

    # The checkpoint keeps the FORWARD packing (nb_f, S, fold·p, c).
    # Split the packed-row axis into (fold, p) — a free row-major view —
    # so the block's last two dims EQUAL the array dims: a (…, p, c)
    # block over a (…, fold·p, c) array violates Mosaic's divisible-by-8
    # rule whenever fold > 1 and p % 8 != 0 (r = t + k − 1 is odd-ish;
    # e.g. bt_f=2/bt=1 at t=384 → block 388 over 776, rejected on
    # hardware 2026-08-19).
    ckpt = ckpt.reshape(ckpt.shape[0], s_steps, fold, p, c)
    in_specs = [
        bspec((1, 1, 1, p, c),
              lambda i, j: (i // fold, s_steps - 1 - j, i % fold, 0, 0)),
        bspec((1, p, c), lambda i, j: (i, 0, 0)),                 # dz
        # dld whole ([nb, bt] in SMEM; a (1, bt) block fails Mosaic's
        # sub-(8,128) SMEM rule) — the kernel indexes rows by program_id
        pl.BlockSpec((nb, bt), lambda i, j: (0, 0),
                     memory_space=pltpu.SMEM),                    # dld
        bspec((1, p, 1), lambda i, j: (i, 0, 0)),                 # mask
        whole,                                                    # indicator
        bspec((1, 2, c), lambda i, j: (sj(i, j), 0, 0)),          # actnorm
        bspec((1, c, c), lambda i, j: (sj(i, j), 0, 0)),          # mix_t
        bspec((1, n, ch2), lambda i, j: (sj(i, j), 0, 0)),        # b_in
    ]
    operands = [ckpt, dz_p, dld.reshape(nb, bt), m_p, ind,
                _stack_an(weights), weights['mix_t'].astype(dt),
                weights['b_in'].astype(jnp.float32)]
    if has_cond:
        in_specs.append(bspec((1, 1, n, bt, ch2),
                              lambda i, j: (i, sj(i, j), 0, 0, 0)))
        operands.append(_pack_cond(cond, nb, bt, dt))
    in_specs += [
        bspec((1, c2, ch), lambda i, j: (sj(i, j), 0, 0)),        # w_start
        bspec((1, 1, ch), lambda i, j: (sj(i, j), 0, 0)),         # b_start
        pl.BlockSpec(memory_space=pl.ANY),                        # w_in
        bspec((1, n, ch, ch2), lambda i, j: (sj(i, j), 0, 0, 0)),  # w_rs
        bspec((1, n, ch2), lambda i, j: (sj(i, j), 0, 0)),        # b_rs
        bspec((1, ch, c), lambda i, j: (sj(i, j), 0, 0)),         # w_end
        bspec((1, 1, c), lambda i, j: (sj(i, j), 0, 0)),          # b_end
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
                           lambda i, j: (sj(i, j), 0, 0, 0))]
        operands += [_pack(pitch.astype(dt), bt, r),
                     weights['w_pitch'].astype(dt)]
    in_specs.append(pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                                 memory_space=pltpu.SMEM))
    operands.append(jnp.asarray(seed, jnp.int32).reshape(1, 1))

    out_shape = [
        jax.ShapeDtypeStruct((nb, p, c), jnp.float32),            # dx carry
        jax.ShapeDtypeStruct((nb, s_steps, c2, ch), jnp.float32),  # dws
        jax.ShapeDtypeStruct((nb, s_steps, 1, ch), jnp.float32),  # dbs
        jax.ShapeDtypeStruct((nb, s_steps, n, k * ch, ch2), gdt),  # dwin
        jax.ShapeDtypeStruct((nb, s_steps, n, ch, ch2), gdt),     # dwrs
        jax.ShapeDtypeStruct((nb, s_steps, n, ch2), jnp.float32),  # dbrs
        jax.ShapeDtypeStruct((nb, s_steps, ch, c), jnp.float32),  # dwe
        jax.ShapeDtypeStruct((nb, s_steps, 1, c), jnp.float32),   # dbe
        jax.ShapeDtypeStruct((nb, s_steps, 2, c), jnp.float32),   # dan
        jax.ShapeDtypeStruct((nb, s_steps, c, c), jnp.float32),   # dmix
        jax.ShapeDtypeStruct((nb, s_steps, n, ch2), jnp.float32),  # dbin
    ]
    out_specs = [
        bspec((1, p, c), lambda i, j: (i, 0, 0)),
        bspec((1, 1, c2, ch), lambda i, j: (i, sj(i, j), 0, 0)),
        bspec((1, 1, 1, ch), lambda i, j: (i, sj(i, j), 0, 0)),
        pl.BlockSpec(memory_space=pl.ANY),
        bspec((1, 1, n, ch, ch2), lambda i, j: (i, sj(i, j), 0, 0, 0)),
        bspec((1, 1, n, ch2), lambda i, j: (i, sj(i, j), 0, 0)),
        bspec((1, 1, ch, c), lambda i, j: (i, sj(i, j), 0, 0)),
        bspec((1, 1, 1, c), lambda i, j: (i, sj(i, j), 0, 0)),
        bspec((1, 1, 2, c), lambda i, j: (i, sj(i, j), 0, 0)),
        bspec((1, 1, c, c), lambda i, j: (i, sj(i, j), 0, 0)),
        bspec((1, 1, n, ch2), lambda i, j: (i, sj(i, j), 0, 0)),
    ]
    if has_cond:
        out_shape.append(jax.ShapeDtypeStruct(
            (nb, s_steps, n, bt, ch2), jnp.float32))
        out_specs.append(bspec((1, 1, n, bt, ch2),
                               lambda i, j: (i, sj(i, j), 0, 0, 0)))
    if has_pitch:
        out_shape += [jax.ShapeDtypeStruct((nb, p, ps), jnp.float32),
                      jax.ShapeDtypeStruct(
                          (nb, s_steps, n, ps, ch2), jnp.float32)]
        out_specs += [bspec((1, p, ps), lambda i, j: (i, 0, 0)),
                      bspec((1, 1, n, ps, ch2),
                            lambda i, j: (i, sj(i, j), 0, 0, 0))]

    scratch = [
        pltpu.VMEM((n, p + 2 * pad_t, ch), dt),     # padded layer inputs
        pltpu.VMEM((p, ch), jnp.float32),           # skip accumulator
        pltpu.VMEM((p, ch), jnp.float32),           # dxin carry
        pltpu.VMEM((p, ch), jnp.float32),           # dskip (constant)
        pltpu.VMEM((p + 2 * pad_t, ch), jnp.float32),  # conv-transpose acc
        pltpu.VMEM((n, k * ch, ch2), dt),           # w_in, one slot/layer
        pltpu.SemaphoreType.DMA((n,)),
        pltpu.VMEM((2, k * ch, ch2), gdt),          # dWin write-back buffer
        pltpu.SemaphoreType.DMA((2,)),
    ]

    kernel = _make_train_bwd_kernel(n, k, ch, c2, bt, r, t, p, s_steps,
                                    rate, has_cond, has_pitch,
                                    pitch.shape[-1] if has_pitch else 0,
                                    mxu3x)
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

    it = iter(results)
    dx_p = next(it)
    f32 = jnp.float32
    grads = {
        'w_start': jnp.sum(next(it), axis=0),
        'b_start': jnp.sum(next(it), axis=0)[:, 0],
        'w_in': jnp.sum(next(it).astype(f32), axis=0
                        ).reshape(s_steps, n, k, ch, ch2),
        'w_rs': jnp.sum(next(it).astype(f32), axis=0),
        'b_rs': jnp.sum(next(it), axis=0),
        'w_end': jnp.sum(next(it), axis=0),
        'b_end': jnp.sum(next(it), axis=0)[:, 0],
    }
    dan = jnp.sum(next(it), axis=0)
    grads['an_logs'] = dan[:, 0]
    grads['an_bias'] = dan[:, 1]
    grads['mix_t'] = jnp.sum(next(it), axis=0)
    grads['b_in'] = jnp.sum(next(it), axis=0)
    dcond = None
    dpitch = None
    if has_cond:
        dcp = next(it)                     # [nb, S, n, bt, ch2]
        dcond = (dcp.transpose(1, 2, 0, 3, 4)
                 .reshape(s_steps, n, nb * bt, ch2)[:, :, :b])
    if has_pitch:
        dpit_p = next(it)
        dpitch = dpit_p.reshape(nb * bt, r, ps)[:b, :t]
        grads['w_pitch'] = jnp.sum(next(it), axis=0)
    dx = dx_p.reshape(nb * bt, r, c)[:b, :t]
    return dx, grads, dcond, dpitch


# ---------------------------------------------------------------------------
# custom-vjp assembly
# ---------------------------------------------------------------------------

_WKEYS = ('w_start', 'b_start', 'w_in', 'w_rs', 'b_rs', 'w_end', 'b_end',
          'b_in', 'an_logs', 'an_bias', 'mix_t')


@functools.lru_cache(maxsize=None)
def _train_core(rate, bt_f, bt_b, nc, interpret, has_cond, has_pitch):
    """custom_vjp core: (x, mask, weights-tuple, cond, pitch, seed)
    → (z, ld_wavenet).  Static configuration baked per cache entry."""

    def base(x, mask, wtup, cond, pitch, seed):
        weights = dict(zip(_WKEYS, wtup))
        if has_pitch:
            weights['w_pitch'] = wtup[len(_WKEYS)]
        z, ld, _ = _fwd_call(x, mask, weights, cond, pitch, seed,
                             rate=rate, bt=bt_f, nc=nc,
                             interpret=interpret)
        return z, ld

    @jax.custom_vjp
    def core(x, mask, wtup, cond, pitch, seed):
        return base(x, mask, wtup, cond, pitch, seed)

    def fwd(x, mask, wtup, cond, pitch, seed):
        weights = dict(zip(_WKEYS, wtup))
        if has_pitch:
            weights['w_pitch'] = wtup[len(_WKEYS)]
        z, ld, ckpt = _fwd_call(x, mask, weights, cond, pitch, seed,
                                rate=rate, bt=bt_f, nc=nc,
                                interpret=interpret)
        res = (ckpt, mask, wtup, cond, pitch, seed,
               x.shape[0], x.shape[1])
        return (z, ld), res

    def bwd(res, cts):
        ckpt, mask, wtup, cond, pitch, seed, b, t = res
        dz, dld = cts
        weights = dict(zip(_WKEYS, wtup))
        if has_pitch:
            weights['w_pitch'] = wtup[len(_WKEYS)]
        dx, grads, dcond, dpitch = _bwd_call(
            ckpt, dz, dld, mask, weights, cond, pitch, seed,
            rate=rate, bt_f=bt_f, bt=bt_b, nc=nc, b=b, t=t,
            interpret=interpret)
        dwtup = tuple(
            grads[key].astype(wtup[idx].dtype)
            for idx, key in enumerate(_WKEYS))
        if has_pitch:
            dwtup += (grads['w_pitch'].astype(
                wtup[len(_WKEYS)].dtype),)
        dseed = np.zeros((), jax.dtypes.float0)
        return (dx.astype(ckpt.dtype), jnp.zeros_like(mask), dwtup,
                None if dcond is None else dcond.astype(cond.dtype),
                None if dpitch is None else dpitch.astype(pitch.dtype),
                dseed)

    core.defvjp(fwd, bwd)
    return core


def fused_flow_stack_train(
    x: jax.Array,
    mask: jax.Array,
    weights: Dict[str, jax.Array],
    cond: Optional[jax.Array] = None,
    pitch: Optional[jax.Array] = None,
    *,
    seed: jax.Array,
    dropout_rate: float = 0.0,
    batch_tile: Optional[int] = None,
    bwd_batch_tile: Optional[int] = None,
    row_chunks: Optional[int] = None,
    interpret: bool = False,
    _skip_shard: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Differentiable train-direction flow stack (forward flow + exact
    logdet + WaveNet dropout) as one Pallas megakernel pair.

    ``weights`` is the :func:`coupling.fused_flow_stack` dict with the
    in-conv bias under its own ``b_in [S, n, 2ch]`` key (dropout hits
    conv+bias before conditioning — reference ``Modules.py:858-869``);
    ``cond [S, n, B, 2ch]`` carries ONLY the post-dropout conditioning
    projections (``None`` in Vanilla mode).  ``seed`` is an int32 scalar
    (fold in the step counter); masks regenerate from it bit-identically
    in the backward kernel and in the twin oracle
    (:func:`flow_stack_train_reference`).

    Returns ``(z [B, T, C], logdet [B] float32)`` — logdet includes the
    per-frame ActNorm/inv-conv constants (added outside the kernel in
    plain JAX so their parameter gradients flow by ordinary autodiff).
    """
    b, t, c = x.shape
    seed = jnp.asarray(seed, jnp.int32)
    k_ = weights['w_in'].shape[2]
    if row_chunks is None:
        # nc=2 everywhere: finer chunking was probed as a VMEM lever at
        # production length and measured WORSE (nc=4: 16.72 M vs nc=2's
        # 16.58 M, v5e 2026-08-19) — the overage is the double-buffered
        # whole-stack weight blocks, fixed by per-layer streaming in
        # :func:`_fwd_call`, not by the stack temporaries.
        row_chunks = 2
    from glow_tts_tpu.ops.coupling import pick_batch_tile
    batch_tile = pick_batch_tile(
        t, k_, weights['w_in'].shape[3], c, x.dtype,
        n=weights['w_in'].shape[1], train=True, nc=row_chunks,
        requested=batch_tile)
    # Backward-kernel tile, calibrated on hardware compile probes
    # (benchmarks/calibrate_vmem.py, v5e 2026-08-19): the bwd kernel's
    # n-slot recompute scratch + weight-grad buffers leave room for
    # bt=2 only up to r≈256 packed rows per sample (t=96 fits at 2;
    # t=384 OOMs at 19.31M and needs 1).  The heuristic only applies
    # when the caller left the knob unset, so recalibration probes can
    # still force larger tiles at production length (ADVICE r4).
    if bwd_batch_tile is None:
        bwd_batch_tile = 1 if t + (k_ - 1) > 256 else 2
    bwd_batch_tile = min(bwd_batch_tile, batch_tile)
    if not _skip_shard:
        from glow_tts_tpu.parallel import mesh as mesh_lib
        mesh = mesh_lib.active_data_mesh(b)
        if mesh is not None:
            from jax.sharding import PartitionSpec as P
            has_pitch_ = pitch is not None
            has_cond_ = cond is not None
            wtup_keys = (_WKEYS + ('ld_const',)
                         + (('w_pitch',) if has_pitch_ else ()))

            def inner(x_, m_, *rest):
                ri = iter(rest)
                cond_ = next(ri) if has_cond_ else None
                pitch_ = next(ri) if has_pitch_ else None
                w_ = dict(zip(wtup_keys, ri))
                # decorrelate dropout across shards
                shard_seed = (jnp.asarray(seed, jnp.int32)
                              + jax.lax.axis_index('data').astype(jnp.int32)
                              * np.int32(0x68E31DA4))
                return fused_flow_stack_train(
                    x_, m_, w_, cond_, pitch_, seed=shard_seed,
                    dropout_rate=dropout_rate, batch_tile=batch_tile,
                    bwd_batch_tile=bwd_batch_tile, row_chunks=row_chunks,
                    interpret=interpret, _skip_shard=True)

            data, rep = P('data'), P()
            in_specs = ((data, data)
                        + ((P(None, None, 'data'),) if has_cond_ else ())
                        + ((data,) if has_pitch_ else ())
                        + (rep,) * len(wtup_keys))
            args = ((x, mask)
                    + ((cond,) if has_cond_ else ())
                    + ((pitch,) if has_pitch_ else ())
                    + tuple(weights[k_] for k_ in wtup_keys))
            return mesh_lib.data_shard_map(
                inner, mesh, in_specs=in_specs,
                out_specs=(data, data))(*args)

    wtup = tuple(weights[k_] for k_ in _WKEYS)
    if pitch is not None:
        wtup += (weights['w_pitch'],)
    core = _train_core(float(dropout_rate), batch_tile, bwd_batch_tile,
                       row_chunks, interpret, cond is not None,
                       pitch is not None)
    z, ld = core(x, mask, wtup, cond, pitch, seed)
    # folded ActNorm + inv-conv per-frame constants: plain JAX so their
    # parameter gradients (an_logs, the 4×4 inv-conv weight behind
    # ld_const) flow by ordinary autodiff
    ld_total = ld + (jnp.sum(weights['ld_const'].astype(jnp.float32))
                     * mask.astype(jnp.float32).sum(axis=(1, 2)))
    return z, ld_total


# ---------------------------------------------------------------------------
# pure-JAX twin (test oracle)
# ---------------------------------------------------------------------------


def flow_stack_train_reference(x, mask, weights, cond=None, pitch=None, *,
                               seed, dropout_rate=0.0):
    """Differentiable pure-JAX twin of :func:`fused_flow_stack_train` —
    the kernel's semantics spelled out in ordinary ``jnp`` (including
    the identical hash dropout masks), used by the parity tests as the
    value/gradient oracle.  Float32 throughout."""
    b, t, c = x.shape
    c2 = c // 2
    s_steps, n, k, ch, ch2 = weights['w_in'].shape
    pad_t = (k - 1) // 2
    r = t + 2 * pad_t
    m = mask.astype(jnp.float32)
    f32 = jnp.float32

    def drop_mask(sj, i):
        rows = (jnp.arange(b, dtype=jnp.uint32)[:, None, None] * np.uint32(r)
                + jnp.arange(t, dtype=jnp.uint32)[None, :, None])
        cols = jnp.arange(ch2, dtype=jnp.uint32)[None, None, :]
        elem = rows * np.uint32(ch2) + cols
        salt = dropmask.layer_salt(seed, sj, i, n)
        bits = dropmask.hash_u32(dropmask.hash_u32(elem + salt))
        inv = np.float32(1.0 / (1.0 - dropout_rate))
        return jnp.where(bits <= dropmask.keep_threshold(dropout_rate),
                         inv, np.float32(0.0))

    def conv(xin, w):
        # k-tap SAME conv with zero padding, as taps of matmuls
        xp = jnp.pad(xin, ((0, 0), (pad_t, pad_t), (0, 0)))
        acc = jnp.zeros((b, t, ch2), f32)
        for d in range(k):
            acc += jnp.einsum('btc,cd->btd', xp[:, d:d + t], w[d],
                              preferred_element_type=f32)
        return acc

    xc = x.astype(f32)
    ld = jnp.zeros((b,), f32)
    for sj in range(s_steps):
        y = (weights['an_bias'][sj][None, None, :]
             + jnp.exp(weights['an_logs'][sj])[None, None, :] * xc) * m
        yd = jnp.einsum('btc,cd->btd', y, weights['mix_t'][sj],
                        preferred_element_type=f32) * m
        xa, xb = yd[..., :c2], yd[..., c2:]
        h = (jnp.einsum('btc,cd->btd', xa, weights['w_start'][sj],
                        preferred_element_type=f32)
             + weights['b_start'][sj][None, None, :]) * m
        xin = h
        skip = jnp.zeros((b, t, ch), f32)
        for i in range(n):
            acc = conv(xin, weights['w_in'][sj, i]) \
                + weights['b_in'][sj, i][None, None, :]
            if dropout_rate > 0.0:
                acc = acc * drop_mask(sj, i)
            if cond is not None:
                acc = acc + cond[sj, i][:, None, :]
            if pitch is not None:
                acc = acc + jnp.einsum('btp,pd->btd', pitch,
                                       weights['w_pitch'][sj, i],
                                       preferred_element_type=f32)
            g = jnp.tanh(acc[..., :ch]) * jax.nn.sigmoid(acc[..., ch:])
            rs = jnp.einsum('btc,cd->btd', g, weights['w_rs'][sj, i],
                            preferred_element_type=f32) \
                + weights['b_rs'][sj, i][None, None, :]
            if i < n - 1:
                xin = (xin + rs[..., :ch]) * m
            skip = skip + rs[..., ch:]
        out = skip * m
        outs = jnp.einsum('btc,cd->btd', out, weights['w_end'][sj],
                          preferred_element_type=f32) \
            + weights['b_end'][sj][None, None, :]
        mean, logs = outs[..., :c2], outs[..., c2:]
        zb = (mean + jnp.exp(logs) * xb) * m
        ld = ld + (logs * m).sum(axis=(1, 2))
        xc = jnp.concatenate([xa, zb], axis=-1)
    ld = ld + (jnp.sum(weights['ld_const'].astype(f32))
               * m.sum(axis=(1, 2)))
    return xc, ld
