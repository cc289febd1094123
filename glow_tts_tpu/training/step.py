"""Jitted train / eval / inference steps and state construction.

One ``jax.jit``-compiled function per role (the reference's eager
``Train_Step`` is ``Train.py:182-238``); under a mesh the batch arrives
sharded over the ``data`` axis and XLA inserts the gradient all-reduce.

ActNorm's data-dependent initialisation happens inside
:func:`create_train_state`: ``model.init`` is called on a real (or
synthetic) batch, so the flow statistics are produced exactly as Glow
prescribes (cf. ``Modules.py:698-711`` and the checkpoint-restore invariant
``Train.py:527-528`` which is structurally impossible to get wrong here —
restored parameters simply replace the initialised ones).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from glow_tts_tpu.config import Config
from glow_tts_tpu.models.glow_tts import GlowTTS
from glow_tts_tpu.training import losses
from glow_tts_tpu.training.optim import make_optimizer


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    dropout_rng: jax.Array
    # EMA sufficient statistics (cnt, s0, s1) of the per-token-ID Gaussian
    # table for the 'em' alignment warmup (train.alignment_warmup_mode);
    # None outside that mode.
    em_stats: Any = None

    def next_rng(self) -> Tuple[jax.Array, jax.Array]:
        return jax.random.split(self.dropout_rng)

    def __setstate__(self, state_dict):
        # Unpickle compat: states saved before the em_stats field existed
        # lack the attribute in their pickled __dict__.
        state_dict.setdefault('em_stats', None)
        self.__dict__.update(state_dict)


def init_em_stats(config: Config) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Zero-initialised EM table statistics for the 'em' warmup."""
    vocab = config.encoder.embedding_tokens
    channels = config.sound.mel_dim   # z is unsqueezed back to mel_dim
    return (jnp.zeros((vocab,), jnp.float32),
            jnp.zeros((vocab, channels), jnp.float32),
            jnp.zeros((vocab, channels), jnp.float32))


def build_model(config: Config) -> GlowTTS:
    dtype = jnp.dtype(config.tpu.compute_dtype) \
        if config.tpu.compute_dtype else jnp.float32
    return GlowTTS(config, dtype=dtype)


def create_train_state(config: Config, rng: jax.Array,
                       batch: Dict[str, Any]) -> Tuple[GlowTTS, TrainState]:
    model = build_model(config)
    init_rng, dropout_rng = jax.random.split(rng)

    # jit the whole init: it contains the ActNorm data-dependent statistics
    # and a full forward (including MAS); run op-by-op it pays per-op
    # dispatch latency, which is prohibitive through the TPU tunnel.
    @jax.jit
    def init_fn(rngs, tokens, token_lengths, mels, mel_lengths, speakers,
                mels_for_ge2e, pitches):
        return model.init(
            rngs, tokens=tokens, token_lengths=token_lengths, mels=mels,
            mel_lengths=mel_lengths, speakers=speakers,
            mels_for_ge2e=mels_for_ge2e, pitches=pitches,
            deterministic=False)

    variables = init_fn(
        {'params': init_rng, 'dropout': jax.random.fold_in(init_rng, 1)},
        batch['tokens'], batch['token_lengths'], batch['mels'],
        batch['mel_lengths'], batch.get('speakers'),
        batch.get('mels_for_ge2e'), batch.get('pitches'))
    params = variables['params']
    tx = make_optimizer(config)
    em_stats = None
    if (config.train.alignment_warmup_steps > 0
            and config.train.alignment_warmup_mode == 'em'):
        em_stats = init_em_stats(config)
    state = TrainState(
        step=jnp.zeros([], jnp.int32),
        params=params,
        opt_state=tx.init(params),
        dropout_rng=dropout_rng,
        em_stats=em_stats)
    return model, state


def compute_losses(config: Config, outputs: Dict[str, Any],
                   batch: Dict[str, Any]) -> Dict[str, jax.Array]:
    loss_dict = {
        'mle': losses.mle_loss(
            outputs['z'], outputs['mel_mean'], outputs['mel_log_std'],
            outputs['log_dets'], batch['mel_lengths'],
            config.decoder.num_squeeze, config.sound.mel_dim),
        'duration': losses.duration_loss(
            outputs['log_durations'], outputs['log_duration_targets']),
    }
    total = loss_dict['mle'] + loss_dict['duration']
    if outputs.get('classified_speakers') is not None:
        loss_dict['speaker'] = losses.speaker_ce_loss(
            outputs['classified_speakers'], batch['speakers'])
        total = total + loss_dict['speaker']
    if outputs.get('distill_mean') is not None:
        # 'em' alignment warmup: regress the network prior onto the
        # closed-form EM table (train.em_distill_weight).
        loss_dict['distill'] = losses.prior_distill_loss(
            outputs['prior_mean'], outputs['prior_log_std'],
            outputs['distill_mean'], outputs['distill_log_std'],
            outputs['token_mask'])
        total = total + config.train.em_distill_weight * loss_dict['distill']
    loss_dict['total'] = total
    return loss_dict


def make_train_step(config: Config, model: GlowTTS,
                    linear_alignment: bool = False,
                    anchored_alignment: bool = False,
                    em_alignment: bool = False,
                    freeze_decoder: bool = False):
    """``linear_alignment=True`` builds the alignment-warmup variant of the
    step (uniform path instead of MAS — ``train.alignment_warmup_steps``);
    ``anchored_alignment=True`` the silence-anchored variant
    (``train.alignment_warmup_mode: 'anchored'`` — MAS over a pause/energy
    + guided-diagonal surrogate score, models/glow_tts.py);
    ``em_alignment=True`` the closed-form EM variant
    (``train.alignment_warmup_mode: 'em'`` — per-token-ID Gaussian table
    on stop_grad(z) with EMA statistics carried in ``state.em_stats`` and
    the network prior distilled onto the table, models/glow_tts.py:
    em_alignment_path); ``freeze_decoder=True`` zeroes the flow-decoder
    updates (``train.decoder_freeze_steps``) so the prior locks the
    alignment against a *fixed* flow featurisation before the flow starts
    whitening the corpus — the measured cure for the cold-start alignment
    race (docs/CONVERGENCE.md).  Each flag combination is a separate jit
    specialisation, selected per-step on the host."""
    tx = make_optimizer(config)

    def train_step(state: TrainState, batch: Dict[str, Any]):
        rng, next_rng = jax.random.split(state.dropout_rng)

        def loss_fn(params):
            outputs = model.apply(
                {'params': params},
                tokens=batch['tokens'],
                token_lengths=batch['token_lengths'],
                mels=batch['mels'],
                mel_lengths=batch['mel_lengths'],
                speakers=batch.get('speakers'),
                mels_for_ge2e=batch.get('mels_for_ge2e'),
                pitches=batch.get('pitches'),
                deterministic=False,
                linear_alignment=linear_alignment,
                anchored_alignment=anchored_alignment,
                em_alignment=em_alignment,
                em_stats=state.em_stats if em_alignment else None,
                rngs={'dropout': rng})
            loss_dict = compute_losses(config, outputs, batch)
            return loss_dict['total'], (loss_dict,
                                        outputs.get('em_stats'))

        (_, (loss_dict, new_em_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        if freeze_decoder:
            # zero the UPDATES, not the gradients: the optimizer moments
            # keep accumulating real curvature, so the release step is
            # normalised like any other (zeroing gradients instead leaves
            # the second moments empty and the first released update is
            # an oversized sign-step — observed to NaN the flow)
            updates = {k: (jax.tree_util.tree_map(jnp.zeros_like, v)
                           if k == 'decoder' else v)
                       for k, v in updates.items()}
        params = optax.apply_updates(state.params, updates)
        metrics = dict(loss_dict)
        metrics['grad_norm'] = optax.global_norm(grads)
        new_state = state.replace(
            step=state.step + 1, params=params, opt_state=opt_state,
            dropout_rng=next_rng,
            em_stats=new_em_stats if em_alignment else state.em_stats)
        return new_state, metrics

    return train_step


def make_eval_step(config: Config, model: GlowTTS):
    def eval_step(state: TrainState, batch: Dict[str, Any]):
        outputs = model.apply(
            {'params': state.params},
            tokens=batch['tokens'],
            token_lengths=batch['token_lengths'],
            mels=batch['mels'],
            mel_lengths=batch['mel_lengths'],
            speakers=batch.get('speakers'),
            mels_for_ge2e=batch.get('mels_for_ge2e'),
            pitches=batch.get('pitches'),
            deterministic=True)
        loss_dict = compute_losses(config, outputs, batch)
        return loss_dict, outputs

    return eval_step


def make_inference_step(config: Config, model: GlowTTS,
                        max_mel_length: int = 1024,
                        noise_scale: float = 1.0):
    """Inference runs under the *selective precision policy*: training keeps
    fast bf16 compute, but synthesis uses ``tpu.inference_dtype`` activations
    and ``tpu.inference_matmul_precision`` MXU passes (defaults f32 + 3-pass
    'tensorfloat32': mel MAE 7.7e-5 vs the fp32 torch reference at 1.77× the
    bf16 batch time — see the sweep table in ``config.py``)."""
    import contextlib

    infer_dtype = jnp.dtype(config.tpu.inference_dtype
                            or config.tpu.compute_dtype or 'float32')
    infer_model = model if infer_dtype == model.dtype \
        else GlowTTS(config, dtype=infer_dtype)
    precision = config.tpu.inference_matmul_precision

    def _precision_scope():
        if precision and precision != 'default':
            return jax.default_matmul_precision(precision)
        return contextlib.nullcontext()

    def inference_step(state: TrainState, batch: Dict[str, Any],
                       rng: jax.Array):
        with _precision_scope():
            return infer_model.apply(
                {'params': state.params},
                tokens=batch['tokens'],
                token_lengths=batch['token_lengths'],
                mels_for_prosody=batch.get('mels_for_prosody'),
                mel_lengths_for_prosody=batch.get('mel_lengths_for_prosody'),
                speakers=batch.get('speakers'),
                mels_for_ge2e=batch.get('mels_for_ge2e'),
                pitches=batch.get('pitches'),
                pitch_lengths=batch.get('pitch_lengths'),
                noise_key=rng,
                noise_scale=noise_scale,
                length_scale=batch.get('length_scales', 1.0),
                max_mel_length=max_mel_length,
                method=GlowTTS.inference)

    return inference_step


def make_two_phase_inference(config: Config, model: GlowTTS):
    """Bucketed serving pair (``prior_step``, ``decode_step_for(bucket)``).

    Phase 1 runs the token-capacity work (conditioning, encoder, scaled
    durations); the host reads the summed durations and picks the smallest
    static mel bucket that fits, then phase 2 (one jit specialisation per
    bucket, cached by the caller) runs the alignment/z/inverse-flow at
    that capacity.  Composing both phases at the same ``max_mel_length``
    is exactly :meth:`GlowTTS.inference` — the single-phase step and the
    two-phase pair share the model methods, so they cannot drift
    (``tests/test_inference_buckets.py``).  The reference always decodes
    at the dynamic batch max on one GPU (``Modules.py:128-204``); static
    buckets are the XLA-native equivalent with compiled-shape reuse."""
    import contextlib

    infer_dtype = jnp.dtype(config.tpu.inference_dtype
                            or config.tpu.compute_dtype or 'float32')
    infer_model = model if infer_dtype == model.dtype \
        else GlowTTS(config, dtype=infer_dtype)
    precision = config.tpu.inference_matmul_precision

    def _precision_scope():
        if precision and precision != 'default':
            return jax.default_matmul_precision(precision)
        return contextlib.nullcontext()

    def prior_step(state: TrainState, batch: Dict[str, Any]):
        with _precision_scope():
            return infer_model.apply(
                {'params': state.params},
                tokens=batch['tokens'],
                token_lengths=batch['token_lengths'],
                mels_for_prosody=batch.get('mels_for_prosody'),
                mel_lengths_for_prosody=batch.get('mel_lengths_for_prosody'),
                speakers=batch.get('speakers'),
                mels_for_ge2e=batch.get('mels_for_ge2e'),
                length_scale=batch.get('length_scales', 1.0),
                method=GlowTTS.inference_prior)

    def decode_step_for(bucket: int):
        def decode_step(state: TrainState, prior: Dict[str, Any],
                        batch: Dict[str, Any], rng: jax.Array,
                        noise_scale):
            with _precision_scope():
                return infer_model.apply(
                    {'params': state.params},
                    prior,
                    pitches=batch.get('pitches'),
                    pitch_lengths=batch.get('pitch_lengths'),
                    noise_key=rng,
                    noise_scale=noise_scale,
                    max_mel_length=bucket,
                    method=GlowTTS.inference_decode)
        return decode_step

    return prior_step, decode_step_for
