"""Normalizing-flow mel decoder (Glow): squeeze → [ActNorm → invertible
1×1 conv → WaveNet affine coupling] × K → unsqueeze.

Behaviour surface of the reference ``Modules.py:286-924``:

* time-squeeze by ``num_squeeze`` folding adjacent frames into channels
  (``Modules.py:890-907``); squeezed mask subsamples the last frame of each
  group; sequence truncated to a multiple of ``num_squeeze``
* ActNorm with **data-dependent initialisation** from the first batch's
  masked statistics (``Modules.py:670-711``).  Here that is expressed
  functionally: the parameter *initialisers* close over the first input, so
  one ``model.init`` on a real batch performs Glow's init exactly, and
  checkpoint restore trivially preserves it (no mutable ``initialized``
  flag as in the reference / ``Train.py:527-528``)
* invertible 1×1 conv over ``num_split`` channel groups with the reference's
  interleaved regrouping, QR-orthogonal init with det > 0
  (``Modules.py:713-758``); the reverse pass inverts the 4×4 on the fly
* affine coupling on the channel halves through a 4-layer non-dilated gated
  WaveNet (k5) with per-layer 1×1 conditioning projections for
  speaker / prosody / pitch, zero-initialised output projection
  (``Modules.py:760-887``)
* log-determinants are accumulated in float32 regardless of compute dtype —
  they feed the exact-likelihood loss
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from glow_tts_tpu.config import Config
from glow_tts_tpu.models.layers import (Conv1d, FastDropout,
                                         WNConv1d, masked)


def squeeze(x: jax.Array, mask: Optional[jax.Array],
            num_squeeze: int) -> Tuple[jax.Array, jax.Array]:
    """[B, T, C] → [B, T//s, s·C] folding time into channels (offset-major,
    channel-minor grouping, matching the reference layout)."""
    b, t, c = x.shape
    t = (t // num_squeeze) * num_squeeze
    x = x[:, :t].reshape(b, t // num_squeeze, num_squeeze * c)
    if mask is not None:
        mask = mask[:, num_squeeze - 1:t:num_squeeze]
    else:
        mask = jnp.ones((b, t // num_squeeze, 1), x.dtype)
    return masked(x, mask), mask


def unsqueeze(x: jax.Array, mask: Optional[jax.Array],
              num_squeeze: int) -> Tuple[jax.Array, jax.Array]:
    """Inverse of :func:`squeeze`."""
    b, t, c = x.shape
    x = x.reshape(b, t * num_squeeze, c // num_squeeze)
    if mask is not None:
        mask = jnp.broadcast_to(mask[:, :, None, :],
                                (b, t, num_squeeze, 1)
                                ).reshape(b, t * num_squeeze, 1)
    else:
        mask = jnp.ones((b, t * num_squeeze, 1), x.dtype)
    return masked(x, mask), mask


class ActNorm(nn.Module):
    """Per-channel affine with masked data-dependent init."""
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, mask, reverse: bool = False,
                 return_params: bool = False):
        def stats():
            xf = x.astype(jnp.float32)
            m = mask.astype(jnp.float32)
            denom = jnp.maximum(m.sum(), 1.0)
            mean = (xf * m).sum(axis=(0, 1)) / denom
            var = (xf * xf * m).sum(axis=(0, 1)) / denom - mean ** 2
            logs = 0.5 * jnp.log(jnp.clip(var, 1e-7))
            return mean, logs

        logs = self.param('logs', lambda _: -stats()[1], )
        bias = self.param(
            'bias', lambda _: -stats()[0] * jnp.exp(stats()[1] * -1.0))
        if return_params:
            return logs.astype(jnp.float32), bias.astype(jnp.float32)

        dt = self.dtype or x.dtype
        if reverse:
            z = masked((x - bias.astype(dt)) * jnp.exp(-logs).astype(dt),
                       mask)
            logdet = None
        else:
            z = masked(bias.astype(dt) + jnp.exp(logs).astype(dt) * x,
                       mask)
            logdet = (logs.astype(jnp.float32).sum()
                      * mask.astype(jnp.float32).sum(axis=(1, 2)))
        return z, logdet


class InvertibleConv(nn.Module):
    """Channel-grouped invertible 1×1 convolution.

    The learned parameter is the reference's ``num_split × num_split``
    orthogonal-init matrix acting on interleaved channel groups
    (channel c = (a, m, b') → group g = (a, b'), ``Modules.py:738-756``).
    Instead of materialising the regrouping with reshape/transpose pairs
    (which profile as pure layout-copy time on TPU — ~16 % of a train
    step), the permutation is folded into a block-sparse C×C channel
    mixing matrix M[i, j] = W[g(i), g(j)]·δ(m(i), m(j)) applied as one
    MXU matmul.  Mathematically identical; logdet unchanged
    (det M = det(W)^{C/split}).
    """
    num_split: int
    dtype: Optional[jnp.dtype] = None
    identity_init: bool = False   # decoder.identity_mixing_init

    @staticmethod
    def _grouping(c: int, s: int):
        import numpy as np
        idx = np.arange(c)
        a = idx // (c // 2)
        rem = idx % (c // 2)
        m = rem // (s // 2)
        b = rem % (s // 2)
        return a * (s // 2) + b, m

    @staticmethod
    def _mixing_matrix(w, c: int, s: int):
        """Expand the s×s weight into the block-sparse C×C channel-mixing
        matrix as (P W Pᵀ)·D with CONSTANT one-hot P [C,s] and mask D
        [C,C].  The indexing formulation ``w[g[:,None], g[None,:]]``
        lowers to an XLA gather that costs ~0.3 ms per flow step on TPU
        (profiled: f32[25600] gather fusions dominating the decoder);
        two tiny matmuls with baked constants are essentially free."""
        import numpy as np
        g_idx, m_idx = InvertibleConv._grouping(c, s)
        p = np.zeros((c, s), np.float32)
        p[np.arange(c), g_idx] = 1.0
        d = (m_idx[:, None] == m_idx[None, :]).astype(np.float32)
        return (jnp.asarray(p) @ w.astype(jnp.float32)
                @ jnp.asarray(p).T) * jnp.asarray(d)

    @nn.compact
    def __call__(self, x, mask, reverse: bool = False,
                 return_params: bool = False):
        s = self.num_split
        b, t, c = x.shape
        assert s % 2 == 0 and c % s == 0

        def orthogonal_init(rng):
            if self.identity_init:
                return jnp.eye(s, dtype=jnp.float32)   # det = 1 > 0
            w = jnp.linalg.qr(
                jax.random.normal(rng, (s, s), jnp.float32))[0]
            # enforce det(W) > 0 so logdet starts real
            sign = jnp.sign(jnp.linalg.det(w))
            return w.at[:, 0].multiply(sign)

        weight = self.param('weight', orthogonal_init)
        if return_params:
            return weight.astype(jnp.float32)

        lengths = mask.astype(jnp.float32).sum(axis=(1, 2))
        if reverse:
            w = jnp.linalg.inv(weight)
            logdet = None
        else:
            w = weight
            _, logabsdet = jnp.linalg.slogdet(weight)
            logdet = logabsdet * (c / s) * lengths

        mixing = self._mixing_matrix(w, c, s)                # [C_out, C_in]
        z = jnp.einsum('btc,dc->btd', x, mixing.astype(x.dtype),
                       preferred_element_type=jnp.float32).astype(x.dtype)
        return masked(z, mask), logdet


class WaveNet(nn.Module):
    """Non-dilated gated conv stack with additive global conditioning.

    ``return_params=True`` declares the identical parameter tree but
    returns the effective (weight-normed) kernels stacked per layer for
    the fused Pallas coupling (``ops/coupling.py``) instead of applying.
    """
    config: Config
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, mask, speaker=None, prosody=None, pitch=None,
                 deterministic: bool = True, return_params: bool = False):
        cfg = self.config.decoder.affine_coupling
        ch = cfg.calc_channels
        n = cfg.wavenet.num_layers
        import functools
        WN = functools.partial(WNConv1d,
                               fold=self.config.tpu.fold_weight_norm)
        if return_params:
            dummy = jnp.zeros((1, 1, ch), x.dtype)
            packs = {key: [] for key in
                     ('w_in', 'b_in', 'w_rs', 'b_rs', 'w_spk', 'b_spk',
                      'w_pro', 'b_pro', 'w_pitch', 'b_pitch')}
            for i in range(n):
                kin, bin_ = WN(2 * ch, cfg.wavenet.kernel_size,
                                     dtype=self.dtype, name=f'in_{i}')(
                    dummy, return_params=True)
                packs['w_in'].append(kin)
                packs['b_in'].append(bin_)
                if speaker is not None:
                    kk, bb = WN(2 * ch, 1, dtype=self.dtype,
                                      name=f'speaker_{i}')(
                        speaker[:, None, :], return_params=True)
                    packs['w_spk'].append(kk[0])
                    packs['b_spk'].append(bb)
                if prosody is not None:
                    kk, bb = WN(2 * ch, 1, dtype=self.dtype,
                                      name=f'prosody_{i}')(
                        prosody[:, None, :], return_params=True)
                    packs['w_pro'].append(kk[0])
                    packs['b_pro'].append(bb)
                if pitch is not None:
                    kk, bb = WN(2 * ch, 1, dtype=self.dtype,
                                      name=f'pitch_{i}')(
                        pitch, return_params=True)
                    packs['w_pitch'].append(kk[0])
                    packs['b_pitch'].append(bb)
                last = i == n - 1
                krs, brs = WN(ch if last else 2 * ch, 1,
                                    dtype=self.dtype,
                                    name=f'res_skip_{i}')(
                    dummy, return_params=True)
                if last:
                    # uniform [ch, 2ch] layout: the last layer feeds only
                    # the skip half; its dead res half is zero
                    krs = jnp.concatenate(
                        [jnp.zeros_like(krs), krs], axis=-1)
                    brs = jnp.concatenate([jnp.zeros_like(brs), brs])
                packs['w_rs'].append(krs[0])
                packs['b_rs'].append(brs)
            return {key: (jnp.stack(vals) if vals else None)
                    for key, vals in packs.items()}
        output = jnp.zeros_like(x)
        for i in range(n):
            ins = WN(2 * ch, cfg.wavenet.kernel_size,
                           dtype=self.dtype, name=f'in_{i}')(x)
            ins = FastDropout(cfg.wavenet.dropout_rate,
                              time_major_bits=True)(
                ins, deterministic=deterministic)
            if speaker is not None:
                ins = ins + WN(2 * ch, 1, dtype=self.dtype,
                                     name=f'speaker_{i}')(
                    speaker[:, None, :].astype(ins.dtype))
            if prosody is not None:
                ins = ins + WN(2 * ch, 1, dtype=self.dtype,
                                     name=f'prosody_{i}')(
                    prosody[:, None, :].astype(ins.dtype))
            if pitch is not None:
                ins = ins + WN(2 * ch, 1, dtype=self.dtype,
                                     name=f'pitch_{i}')(pitch)
            gate = jnp.tanh(ins[..., :ch]) * jax.nn.sigmoid(ins[..., ch:])
            last = i == n - 1
            res_skip = WN(ch if last else 2 * ch, 1,
                                dtype=self.dtype, name=f'res_skip_{i}')(gate)
            if last:
                output = output + res_skip
            else:
                x = masked(x + res_skip[..., :ch], mask)
                output = output + res_skip[..., ch:]
        return masked(output, mask)


class AffineCoupling(nn.Module):
    config: Config
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, mask, speaker=None, prosody=None, pitch=None,
                 reverse: bool = False, deterministic: bool = True,
                 return_params: bool = False):
        cfg = self.config.decoder.affine_coupling
        c = x.shape[-1]
        x_a, x_b = x[..., :c // 2], x[..., c // 2:]

        start_mod = WNConv1d(cfg.calc_channels, 1, dtype=self.dtype,
                             fold=self.config.tpu.fold_weight_norm,
                             name='start')
        wavenet = WaveNet(self.config, self.dtype, name='wavenet')
        end_mod = Conv1d(c, 1, kernel_init=nn.initializers.zeros,
                         dtype=self.dtype, name='end')

        if return_params:
            # hand the packed kernel weights + conditioning bias to a
            # fused caller one level up (FlowStep)
            return self._gather(x_a, mask, start_mod, wavenet, end_mod,
                                speaker, prosody, pitch,
                                split_bias=return_params == 'split_bias')

        backend = self.config.tpu.coupling_backend
        # hardware fused path is bf16-only: Mosaic's default f32 dot is a
        # single bf16 MXU pass, which would silently degrade the f32
        # selective-precision inference policy (see ops/coupling.py).
        # Under tensor parallelism the kernels are GSPMD-opaque — fall
        # through to flax so GSPMD partitions the WaveNet over 'model'.
        from glow_tts_tpu.parallel import mesh as mesh_lib
        dt = self.dtype or x.dtype
        fused = deterministic and mesh_lib.active_model_parallel() == 1 and (
            backend == 'fused_interpret'
            or (backend == 'fused'
                and jax.default_backend() == 'tpu'
                and dt == jnp.bfloat16))
        if fused:
            return self._fused(x_a, x_b, mask, start_mod, wavenet, end_mod,
                               speaker, prosody, pitch, reverse,
                               interpret=backend == 'fused_interpret')

        h = masked(start_mod(x_a), mask)
        h = wavenet(h, mask, speaker, prosody, pitch, deterministic)
        outs = end_mod(h)
        mean, logs = outs[..., :c // 2], outs[..., c // 2:]

        if reverse:
            x_b = masked((x_b - mean) * jnp.exp(-logs), mask)
            logdet = None
        else:
            x_b = masked(mean + jnp.exp(logs) * x_b, mask)
            logdet = (logs.astype(jnp.float32)
                      * mask.astype(jnp.float32)).sum(axis=(1, 2))
        return jnp.concatenate([x_a, x_b], axis=-1), logdet

    def _gather(self, x_a, mask, start_mod, wavenet, end_mod,
                speaker, prosody, pitch, split_bias=False):
        """Create the identical parameter tree and pack the effective
        kernels + per-layer conditioning bias for ``ops/coupling.py``.

        ``split_bias=True`` (the train-direction kernel,
        ``ops/coupling_grad.py``): the in-conv bias stays under its own
        ``b_in`` key — dropout hits conv+bias BEFORE the conditioning
        adds (reference ``Modules.py:858-869``) — and the returned cond
        carries only the post-dropout projections (``None`` when there
        are none, i.e. Vanilla mode)."""
        ch = self.config.decoder.affine_coupling.calc_channels
        b = x_a.shape[0]
        c = 2 * x_a.shape[-1]
        w_start, b_start = start_mod(x_a, return_params=True)
        wn = wavenet(x_a, mask, speaker, prosody, pitch,
                     return_params=True)
        w_end, b_end = end_mod(jnp.zeros((1, 1, ch), x_a.dtype),
                               return_params=True)

        n, ch2 = wn['b_in'].shape
        if split_bias:
            cond = (jnp.zeros((n, b, ch2), jnp.float32)
                    if (speaker is not None or prosody is not None
                        or pitch is not None) else None)
        else:
            cond = jnp.broadcast_to(wn['b_in'][:, None, :], (n, b, ch2))
        if speaker is not None:
            cond = cond + (jnp.einsum('bd,nds->nbs',
                                      speaker.astype(jnp.float32),
                                      wn['w_spk'])
                           + wn['b_spk'][:, None, :])
        if prosody is not None:
            cond = cond + (jnp.einsum('bd,nds->nbs',
                                      prosody.astype(jnp.float32),
                                      wn['w_pro'])
                           + wn['b_pro'][:, None, :])
        if pitch is not None:
            cond = cond + wn['b_pitch'][:, None, :]

        weights = {
            'w_start': w_start[0], 'b_start': b_start,
            'w_in': wn['w_in'], 'w_rs': wn['w_rs'], 'b_rs': wn['b_rs'],
            'w_end': w_end, 'b_end': b_end,
        }
        if split_bias:
            weights['b_in'] = wn['b_in']
        if pitch is not None:
            weights['w_pitch'] = wn['w_pitch']
        return weights, cond

    def _fused(self, x_a, x_b, mask, start_mod, wavenet, end_mod,
               speaker, prosody, pitch, reverse, interpret):
        """Deterministic path through the fused Pallas coupling kernel
        (``ops/coupling.py``) — same parameters, same math, one
        VMEM-resident pass instead of per-layer HBM round trips."""
        from glow_tts_tpu.ops.coupling import fused_coupling

        weights, cond = self._gather(x_a, mask, start_mod, wavenet,
                                     end_mod, speaker, prosody, pitch)
        # enforce the module compute dtype: upstream mask multiplies promote
        # activations to f32, which would silently flip the kernel into the
        # (slower, weight-streaming) f32 configuration
        dt = self.dtype or x_a.dtype
        z_b, logdet = fused_coupling(
            x_a.astype(dt), x_b.astype(dt), mask, weights, cond,
            pitch=pitch, reverse=reverse, interpret=interpret)
        return jnp.concatenate([x_a, z_b.astype(x_a.dtype)], axis=-1), logdet


class FlowStep(nn.Module):
    """ActNorm → invertible 1×1 → affine coupling (reference ``AIA``,
    ``Modules.py:653-668``); order reversed on the inverse pass."""
    config: Config
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, mask, speaker=None, prosody=None, pitch=None,
                 reverse: bool = False, deterministic: bool = True,
                 return_params: bool = False):
        actnorm = ActNorm(self.dtype, name='actnorm')
        invconv = InvertibleConv(
            self.config.decoder.num_split, self.dtype,
            identity_init=self.config.decoder.identity_mixing_init,
            name='invconv')
        coupling = AffineCoupling(self.config, self.dtype, name='coupling')

        if return_params:
            # hand this step's fused weight dict + conditioning bias to the
            # 12-step stack kernel one level up (FlowDecoder)
            return self._fused_params(
                x, mask, actnorm, invconv, coupling, speaker, prosody,
                pitch, reverse,
                split_bias=return_params == 'split_bias')

        backend = self.config.tpu.coupling_backend
        dt = self.dtype or x.dtype
        # 'auto' resolves to flax/XLA (measured fastest after the
        # gather-free mixing fix); 'fused' opts into the Pallas flow-step
        # kernel (f32 runs the in-kernel 3-pass decomposition —
        # ops/coupling.py module header).  Tensor parallelism → flax
        # (kernels are GSPMD-opaque; see parallel/tp.py).
        from glow_tts_tpu.parallel import mesh as mesh_lib
        fused = deterministic and mesh_lib.active_model_parallel() == 1 and (
            backend == 'fused_interpret'
            or (backend == 'fused'
                and jax.default_backend() == 'tpu'
                and dt in (jnp.bfloat16, jnp.float32)))
        if fused:
            return self._fused_step(
                x, mask, actnorm, invconv, coupling, speaker, prosody,
                pitch, reverse, interpret=backend == 'fused_interpret')

        logdet_total = jnp.zeros((x.shape[0],), jnp.float32)
        if reverse:
            x, _ = coupling(x, mask, speaker, prosody, pitch,
                            reverse=True, deterministic=deterministic)
            x, _ = invconv(x, mask, reverse=True)
            x, _ = actnorm(x, mask, reverse=True)
        else:
            x, ld = actnorm(x, mask)
            logdet_total += ld
            x, ld = invconv(x, mask)
            logdet_total += ld
            x, ld = coupling(x, mask, speaker, prosody, pitch,
                             deterministic=deterministic)
            logdet_total += ld
        return x, logdet_total

    def _fused_params(self, x, mask, actnorm, invconv, coupling,
                      speaker, prosody, pitch, reverse,
                      split_bias=False):
        """Declare the identical parameter tree and pack this step's
        effective weights (+ the folded ActNorm/mixing terms) for the
        fused flow-step / flow-stack kernels (``ops/coupling.py``;
        ``split_bias`` → the train-direction kernel layout,
        ``ops/coupling_grad.py``)."""
        c = x.shape[-1]
        s = self.config.decoder.num_split
        logs, bias = actnorm(x, mask, return_params=True)
        w = invconv(x, mask, return_params=True)
        weights, cond = coupling(
            x, mask, speaker, prosody, pitch,
            return_params='split_bias' if split_bias else True)

        w_use = jnp.linalg.inv(w) if reverse else w
        mixing = InvertibleConv._mixing_matrix(w_use, c, s)
        weights = dict(weights)
        weights['an_logs'] = logs
        weights['an_bias'] = bias
        weights['mix_t'] = mixing.T
        if not reverse:
            weights['ld_const'] = (
                jnp.sum(logs) + jnp.linalg.slogdet(w)[1] * (c / s))
        return weights, cond

    def _fused_step(self, x, mask, actnorm, invconv, coupling,
                    speaker, prosody, pitch, reverse, interpret):
        """Whole flow step (ActNorm → inv-1×1 → coupling; reverse order on
        the inverse pass) as ONE Pallas call (``ops/coupling.py``): the
        ActNorm affine and the block-sparse channel mixing become the
        kernel's prologue/epilogue, removing two XLA-op regions and two
        kernel boundaries per step from the hot flow loop."""
        from glow_tts_tpu.ops.coupling import fused_flow_step

        weights, cond = self._fused_params(
            x, mask, actnorm, invconv, coupling, speaker, prosody, pitch,
            reverse)
        dt = self.dtype or x.dtype
        z, ld = fused_flow_step(x.astype(dt), mask, weights, cond,
                                pitch=pitch, reverse=reverse,
                                interpret=interpret)
        if ld is None:
            ld = jnp.zeros((x.shape[0],), jnp.float32)
        return z.astype(x.dtype), ld


class FlowDecoder(nn.Module):
    """mels ↔ latents.  Forward (training) returns summed log-determinants;
    reverse (inference) runs the steps backwards."""
    config: Config
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, mask, speaker=None, prosody=None, pitch=None,
                 reverse: bool = False, deterministic: bool = True):
        s = self.config.decoder.num_squeeze
        x, sq_mask = squeeze(x, mask, s)
        if pitch is not None:
            pitch, _ = squeeze(pitch[..., None], mask, s)   # [B, T/s, s]

        step_cls = FlowStep
        if self.config.tpu.remat_flows and not reverse:
            # recompute each flow step in the backward pass instead of
            # keeping its activations (reverse/deterministic flags stay
            # static so python control flow inside the step is unaffected);
            # tpu.remat_policy selects what remains saved (e.g.
            # 'dots_saveable' keeps the MXU outputs and recomputes only the
            # elementwise chains).  At the bench shape every remat flavour
            # measured SLOWER than no-remat (exp_variants_r5.jsonl), so
            # this is a memory-capacity knob, not a speed one.
            policy = None
            if self.config.tpu.remat_policy:
                policy = getattr(jax.checkpoint_policies,
                                 self.config.tpu.remat_policy)
            step_cls = nn.remat(FlowStep, static_argnums=(6, 7),
                                policy=policy)
        steps = [
            step_cls(self.config, self.dtype, name=f'flow_{i}')
            for i in range(self.config.decoder.stack)
        ]

        backend = self.config.tpu.coupling_backend
        dt = self.dtype or x.dtype
        # 'mega' runs the WHOLE stack as one Pallas call (grid over flow
        # steps, activations VMEM-resident throughout, weights streamed by
        # block double-buffering; f32 = in-kernel 3-pass dots + manual
        # weight DMA).  At init time fall through to the sequential path
        # so each ActNorm's data-dependent init sees ITS OWN input, not
        # the stack input.  Tensor parallelism → sequential flax path
        # (the kernels are GSPMD-opaque; see parallel/tp.py).
        from glow_tts_tpu.parallel import mesh as mesh_lib
        no_tp = mesh_lib.active_model_parallel() == 1
        mega = (deterministic and not self.is_initializing() and no_tp
                and not self.config.tpu.remat_flows
                and (backend == 'mega_interpret'
                     or (backend == 'mega'
                         and jax.default_backend() == 'tpu'
                         and dt in (jnp.bfloat16, jnp.float32))))
        # training (the forward flow with WaveNet dropout) has its own
        # megakernel pair with a hand-written Pallas backward pass
        # (ops/coupling_grad.py); hardware path is bf16-only — the f32
        # backward's recompute scratch does not fit VMEM
        mega_train = (not deterministic and not reverse
                      and not self.is_initializing() and no_tp
                      and not self.config.tpu.remat_flows
                      and (backend == 'mega_interpret'
                           or (backend == 'mega'
                               and jax.default_backend() == 'tpu'
                               and dt == jnp.bfloat16)))
        if mega:
            x, logdet_total = self._mega(
                steps, x, sq_mask, speaker, prosody, pitch, reverse,
                deterministic, interpret=backend == 'mega_interpret')
        elif mega_train:
            x, logdet_total = self._mega_train(
                steps, x, sq_mask, speaker, prosody, pitch,
                interpret=backend == 'mega_interpret')
        else:
            logdet_total = jnp.zeros((x.shape[0],), jnp.float32)
            for step in (reversed(steps) if reverse else steps):
                # positional so the remat static_argnums line up
                x, ld = step(x, sq_mask, speaker, prosody, pitch,
                             reverse, deterministic)
                logdet_total += ld

        x, out_mask = unsqueeze(x, sq_mask, s)
        return x, (None if reverse else logdet_total), out_mask

    def _mega(self, steps, x, mask, speaker, prosody, pitch, reverse,
              deterministic, interpret):
        """Gather every step's fused weights, stack them along a flow axis
        and run the 12-step megakernel (``ops/coupling.py``
        ``fused_flow_stack``).  Steps are always gathered in forward
        order; the kernel's index maps reverse the order on the inverse
        pass."""
        from glow_tts_tpu.ops.coupling import fused_flow_stack

        gathered = [
            step(x, mask, speaker, prosody, pitch, reverse, deterministic,
                 return_params=True)
            for step in steps
        ]
        stacked = {
            key: jnp.stack([w[key] for w, _ in gathered])
            for key in gathered[0][0]
        }
        cond = jnp.stack([c for _, c in gathered])          # [S, n, B, 2ch]

        dt = self.dtype or x.dtype
        z, ld = fused_flow_stack(x.astype(dt), mask, stacked, cond,
                                 pitch=pitch, reverse=reverse,
                                 interpret=interpret)
        if ld is None:
            ld = jnp.zeros((x.shape[0],), jnp.float32)
        return z.astype(x.dtype), ld

    def _mega_train(self, steps, x, mask, speaker, prosody, pitch,
                    interpret):
        """The megakernel's TRAIN twin: forward flow + exact logdet +
        in-kernel WaveNet dropout, differentiated by the hand-written
        Pallas backward megakernel (``ops/coupling_grad.py``).  Weight
        layout = the deterministic stack's, with the in-conv bias under
        its own key (dropout order, reference ``Modules.py:858-869``)."""
        import numpy as np
        from glow_tts_tpu.ops.coupling_grad import fused_flow_stack_train

        gathered = [
            step(x, mask, speaker, prosody, pitch, False, False,
                 'split_bias')
            for step in steps
        ]
        stacked = {
            key: jnp.stack([w[key] for w, _ in gathered])
            for key in gathered[0][0]
        }
        conds = [c for _, c in gathered]
        cond = None if conds[0] is None else jnp.stack(conds)

        key = self.make_rng('dropout')
        if jnp.issubdtype(key.dtype, jax.dtypes.prng_key):
            key = jax.random.key_data(key)
        kd = key.reshape(-1).astype(jnp.uint32)
        seed = (kd[0] ^ (kd[-1] * np.uint32(0x9E3779B9))).astype(jnp.int32)

        dt = self.dtype or x.dtype
        rate = self.config.decoder.affine_coupling.wavenet.dropout_rate
        z, ld = fused_flow_stack_train(
            x.astype(dt), mask, stacked, cond, pitch,
            seed=seed, dropout_rate=rate, interpret=interpret)
        return z.astype(x.dtype), ld
