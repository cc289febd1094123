"""GlowTTS top model: mode-shaped wiring of encoder, flow decoder, MAS and
the conditioning encoders.

Reference surface ``Modules.py:16-229``:

* four modes (``Hyper_Parameters.yaml:18``): Vanilla (none), SE (speaker
  LUT or frozen GE2E d-vector), PE (GST prosody), GR (speaker + prosody +
  adversarial classifier + pitch conditioning)
* train forward: conditioning → encoder prior (mean, log_std, log_dur) →
  flow z + logdets → prior log-likelihood ``log_P`` (no-grad) → MAS hard
  alignment → per-frame prior stats + duration targets
  (``Modules.py:50-126``)
* inference: durations = ceil(exp(log_dur)·length_scale) → cumsum hard path
  (``Modules.py:213-229``) → z sampled from the aligned prior → inverse
  flow → mels, padding filled with −max_abs_mel (``Modules.py:128-204``)

TPU-first differences: channels-last layout, static shapes (caller provides
the padded mel capacity at inference), MAS runs on-device (Pallas/scan), and
the nine host synchronisation points of the reference do not exist.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from glow_tts_tpu.config import Config
from glow_tts_tpu.models.conditioning import (
    GE2ESpeakerEncoder, GSTProsodyEncoder, SpeakerClassifier, SpeakerLUT,
    interpolate_pitch)
from glow_tts_tpu.models.decoder import FlowDecoder
from glow_tts_tpu.models.encoder import TextEncoder
from glow_tts_tpu.models.layers import sequence_mask
from glow_tts_tpu.ops import mas as mas_ops

LOG_2PI = 1.8378770664093453  # log(2π)


def _matmul_precision_scope(precision):
    """Trace-time matmul-precision scope; None/'default' → no override
    (ambient policy applies)."""
    import contextlib
    if precision and precision != 'default':
        return jax.default_matmul_precision(precision)
    return contextlib.nullcontext()


def prior_log_likelihood(mean, log_std, z, attn_mask):
    """log N(z_j; mean_i, std_i) summed over mel channels, for every
    (token i, frame j) pair — two MXU matmuls (``Modules.py:107-114``).

    mean, log_std: [B, T_tok, M]; z: [B, T_mel, M];
    attn_mask: [B, T_tok, T_mel].  Returns [B, T_tok, T_mel] float32.
    """
    mean = mean.astype(jnp.float32)
    log_std = log_std.astype(jnp.float32)
    z = z.astype(jnp.float32)
    inv_var = jnp.exp(-2.0 * log_std)                       # [B, T_tok, M]
    t_const = jnp.sum(-0.5 * LOG_2PI - log_std, axis=-1)    # [B, T_tok]
    t_mean = jnp.sum(-0.5 * mean * mean * inv_var, axis=-1)  # [B, T_tok]
    quad = jnp.einsum('bim,bjm->bij', inv_var, -0.5 * z * z,
                      preferred_element_type=jnp.float32)
    cross = jnp.einsum('bim,bjm->bij', mean * inv_var, z,
                       preferred_element_type=jnp.float32)
    return ((t_const + t_mean)[:, :, None] + quad + cross) * attn_mask


def generate_path(durations: jax.Array, attn_mask: jax.Array) -> jax.Array:
    """Hard alignment from durations via cumulative sums
    (``Modules.py:213-229``).  durations [B, T_tok]; attn_mask
    [B, T_tok, T_mel] → path [B, T_tok, T_mel]."""
    t_mel = attn_mask.shape[-1]
    cum = jnp.cumsum(durations, axis=1)                     # [B, T_tok]
    frame = jnp.arange(t_mel)[None, None, :]
    ends = frame < cum[:, :, None]
    starts = jnp.pad(ends, ((0, 0), (1, 0), (0, 0)))[:, :-1]
    return (ends.astype(attn_mask.dtype)
            - starts.astype(attn_mask.dtype)) * attn_mask


def linear_alignment_path(token_lengths: jax.Array,
                          mel_lengths: jax.Array,
                          attn_mask: jax.Array) -> jax.Array:
    """Uniform left-to-right alignment: token ``i`` of a length-``L``
    utterance owns frames ``[floor(i·T/L), floor((i+1)·T/L))``.

    Used by the alignment-warmup curriculum
    (``train.alignment_warmup_steps``) as the path MAS is released from —
    no reference analogue (the reference always runs MAS,
    ``Modules.py:116``); motivation in docs/CONVERGENCE.md."""
    t_tok = attn_mask.shape[1]
    tl = jnp.maximum(token_lengths.astype(jnp.float32), 1.0)[:, None]
    ml = mel_lengths.astype(jnp.float32)[:, None]
    i = jnp.arange(t_tok, dtype=jnp.float32)[None, :]
    cum = jnp.where(i < tl, jnp.floor((i + 1.0) * ml / tl), ml)
    durations = cum - jnp.pad(cum, ((0, 0), (1, 0)))[:, :-1]
    return generate_path(durations, attn_mask)


def anchored_alignment_path(tokens: jax.Array,
                            token_lengths: jax.Array,
                            mels: jax.Array,
                            mel_lengths: jax.Array,
                            attn_mask: jax.Array,
                            pause_tokens: tuple,
                            silence_level: float,
                            mas_backend: str,
                            anchor_weight: float = 2.0,
                            diag_weight: float = 10.0) -> jax.Array:
    """Silence-anchored warmup path (``train.alignment_warmup_mode:
    'anchored'``): MAS run on a *surrogate* score instead of the untrained
    prior —

    * an **anchor term**: ±``anchor_weight`` for agreement between "this
      token is a pause" (``tokens ∈ pause_tokens``) and "this frame is
      silent" (mel channel-mean below ``silence_level`` on the ±max_abs_mel
      scale).  Both signals are observable from the batch alone — no
      ground-truth alignment is used;
    * a **guided-attention diagonal term**: −``diag_weight``·(i/L − j/T)²,
      the classic near-diagonal prior, which resolves placement between
      anchors toward the linear path.

    Rationale (docs/CONVERGENCE.md, round 4): at speech-realistic token
    durations the *linear* warmup's cumulative boundary error (a random
    walk in the per-token durations, ~½ token) freezes into a deeply
    self-consistent prior↔MAS fixed point — measured flat at accuracy
    0.531 for 2.5k steps on the v9 corpus.  Pinning the path at pauses
    resets that random walk at every word boundary, so the EM starts
    inside the truth basin.  The reference has no warmup at all (MAS from
    step 0, ``Modules.py:116``); this is the on-device generalisation of
    forced-alignment/VAD bootstraps used in production TTS.

    Reuses the production MAS kernel on the surrogate score — the path is
    exact under the score, monotonic and complete by construction.
    """
    t_mel = attn_mask.shape[-1]
    # mels arrive on the raw timeline (length T_mel) while attn_mask uses
    # the decoder-truncated one ((T_mel//num_squeeze)·num_squeeze); slice
    # so the anchor+diag add is shape-safe for any bucket/squeeze combo
    # (ADVICE r4).
    frame_energy = jnp.mean(mels[:, :t_mel].astype(jnp.float32),
                            axis=-1)                            # [B, T_mel]
    is_sil = (frame_energy < silence_level)                     # [B, T_mel]
    is_pause = jnp.zeros(tokens.shape, bool)
    for pid in pause_tokens:
        is_pause = is_pause | (tokens == pid)                   # [B, T_tok]
    agree = (is_pause[:, :, None] == is_sil[:, None, :])
    anchor = jnp.where(agree, anchor_weight, -anchor_weight)

    tl = jnp.maximum(token_lengths.astype(jnp.float32), 1.0)
    ml = jnp.maximum(mel_lengths.astype(jnp.float32), 1.0)
    i_norm = ((jnp.arange(attn_mask.shape[1], dtype=jnp.float32)[None, :]
               + 0.5) / tl[:, None])                            # [B, T_tok]
    j_norm = ((jnp.arange(t_mel, dtype=jnp.float32)[None, :]
               + 0.5) / ml[:, None])                            # [B, T_mel]
    diag = -diag_weight * jnp.square(i_norm[:, :, None]
                                     - j_norm[:, None, :])
    score = (anchor + diag) * attn_mask
    return mas_ops.maximum_path(score, token_lengths, mel_lengths,
                                backend=mas_backend)


def fit_token_table(tokens: jax.Array,
                    path: jax.Array,
                    z: jax.Array,
                    mel_mask: jax.Array,
                    vocab: int):
    """Batch sufficient statistics of the per-token-ID Gaussian table.

    Hard-EM M-step inputs: each valid frame is owned by the token the
    ``path`` assigns it to; accumulate per token *ID* (not per position)
    count / sum / sum-of-squares of ``z``.  Returns ``(cnt [V],
    s0 [V, C], s1 [V, C])`` in float32.  The scatter is expressed as a
    one-hot matmul so it lands on the MXU (V ≲ a few thousand)."""
    owner = jnp.argmax(path, axis=1)                       # [B, T_mel]
    ids = jnp.take_along_axis(tokens, owner, axis=1)       # [B, T_mel]
    onehot = (jax.nn.one_hot(ids, vocab, dtype=jnp.float32)
              * mel_mask.astype(jnp.float32))              # [B, T_mel, V]
    z32 = z.astype(jnp.float32) * mel_mask.astype(jnp.float32)
    cnt = jnp.einsum('btv->v', onehot)
    s0 = jnp.einsum('btv,btc->vc', onehot, z32,
                    preferred_element_type=jnp.float32)
    s1 = jnp.einsum('btv,btc->vc', onehot, z32 * z32,
                    preferred_element_type=jnp.float32)
    return cnt, s0, s1


def table_prior_log_likelihood(tokens: jax.Array,
                               z: jax.Array,
                               stats,
                               attn_mask: jax.Array):
    """Gaussian log-likelihood score [B, T_tok, T_mel] of ``z`` under the
    closed-form per-token-ID table implied by ``stats = (cnt, s0, s1)``,
    plus the table's (mean, log_std) gathered at the batch tokens — the
    distillation targets for the network prior.  Decomposed as
    const + quad + cross so the T_tok × T_mel interaction is two matmuls
    (same shape as :func:`prior_log_likelihood`)."""
    cnt, s0, s1 = stats
    cc = jnp.maximum(cnt, 1.0)[:, None]                    # [V, 1]
    mu = s0 / cc                                           # [V, C]
    var = jnp.maximum(s1 / cc - mu * mu, 1e-4)             # [V, C]
    m_tok = mu[tokens]                                     # [B, T_tok, C]
    v_tok = var[tokens]
    inv_v = 1.0 / v_tok
    z32 = z.astype(jnp.float32)
    const = jnp.sum(-0.5 * jnp.log(2.0 * jnp.pi * v_tok)
                    - 0.5 * m_tok * m_tok * inv_v, axis=-1)  # [B, T_tok]
    quad = jnp.einsum('bic,bjc->bij', -0.5 * inv_v, z32 * z32,
                      preferred_element_type=jnp.float32)
    cross = jnp.einsum('bic,bjc->bij', m_tok * inv_v, z32,
                       preferred_element_type=jnp.float32)
    log_p = (const[:, :, None] + quad + cross) * attn_mask
    return log_p, m_tok, 0.5 * jnp.log(v_tok)


def em_alignment_path(tokens: jax.Array,
                      token_lengths: jax.Array,
                      mels: jax.Array,
                      mel_lengths: jax.Array,
                      z: jax.Array,
                      attn_mask: jax.Array,
                      mel_mask: jax.Array,
                      em_stats,
                      vocab: int,
                      pause_tokens: tuple,
                      silence_level: float,
                      stats_decay: float,
                      mas_backend: str):
    """Closed-form EM warmup path (``train.alignment_warmup_mode: 'em'``).

    The round-4 measurement this implements (benchmarks/diag_em_on_z.py,
    v9 corpus, TPU v5e): on the frozen flow's z the *network* prior's MAS
    accuracy plateaus at 0.5336, while one closed-form per-token-ID
    Gaussian EM iteration on the SAME z reaches **0.9984** from the
    0.8867-accurate silence-anchored init — the featurisation separates
    the corpus; SGD underfit of the network prior is the blocker.  So the
    warmup runs exactly that E/M pair inside the train step:

    1. init path = :func:`anchored_alignment_path` (observable
       silence/pause pins, no prior involved);
    2. M-step: per-token-ID Gaussian table fit on ``stop_grad(z)`` from
       the init path, pooled with an EMA over past steps' final-path
       statistics (``em_stats``; decay λ → effective window 1/(1−λ)
       batches, recovering the probe's pooled-corpus fit from batch-32
       slices);
    3. E-step: MAS on the table score → the training path;
    4. the table's (mean, log_std) at the batch tokens are returned as
       *distillation targets* so the network prior is regressed directly
       onto the closed-form optimum (plain masked MSE — much better
       conditioned than the exp(−2·log_std)-preconditioned MLE gradient),
       making the lock survive the release to learned-prior MAS.

    Everything is stop-gradded except the returned distillation targets'
    *inputs to the loss* (the targets themselves are constants).  The
    reference has no warmup at all (MAS on the learned prior from step 0,
    ``Modules.py:107-116``); this is the TPU-native in-graph
    generalisation of the forced-alignment bootstrap.

    Returns ``(path, new_em_stats, distill_mean, distill_log_std)``.
    """
    z = jax.lax.stop_gradient(z)
    init_path = anchored_alignment_path(
        tokens, token_lengths, mels, mel_lengths, attn_mask,
        pause_tokens, silence_level, mas_backend)
    batch_stats = fit_token_table(tokens, init_path, z, mel_mask, vocab)
    merged = jax.tree_util.tree_map(
        lambda prev, cur: stats_decay * prev + cur, em_stats, batch_stats)
    log_p, m_tok, log_std_tok = table_prior_log_likelihood(
        tokens, z, merged, attn_mask)
    path = mas_ops.maximum_path(log_p, token_lengths, mel_lengths,
                                backend=mas_backend)
    # Store the EMA over the FINAL (post-E-step) path's statistics: next
    # step's fit then pools ~1/(1−λ) batches of table-quality assignments
    # plus a single fresh anchored-init batch.
    final_stats = fit_token_table(tokens, path, z, mel_mask, vocab)
    new_stats = jax.tree_util.tree_map(
        lambda prev, cur: stats_decay * prev + cur, em_stats, final_stats)
    return (jax.lax.stop_gradient(path), new_stats,
            jax.lax.stop_gradient(m_tok), jax.lax.stop_gradient(log_std_tok))


class GlowTTS(nn.Module):
    config: Config
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        cfg = self.config
        if cfg.uses_speaker_embedding:
            if cfg.speaker_embedding.type.upper() == 'LUT':
                self.speaker_lut = SpeakerLUT(cfg)
            elif cfg.speaker_embedding.type.upper() == 'GE2E':
                self.ge2e = GE2ESpeakerEncoder(cfg, self.dtype)
            else:
                raise ValueError(
                    f'Unsupported speaker embedding type: '
                    f'{cfg.speaker_embedding.type}')
        if cfg.uses_prosody_encoder:
            self.prosody_encoder = GSTProsodyEncoder(cfg, self.dtype)
        if cfg.uses_gradient_reversal:
            self.speaker_classifier = SpeakerClassifier(cfg)
        self.encoder = TextEncoder(cfg, self.dtype)
        self.decoder = FlowDecoder(cfg, self.dtype)

    # -- conditioning -------------------------------------------------------

    def _conditions(self, mels, mel_lengths, speakers, mels_for_ge2e,
                    deterministic, frozen_ge2e=True):
        cfg = self.config
        speaker_vec = prosody_vec = classified = None
        if cfg.uses_speaker_embedding:
            if cfg.speaker_embedding.type.upper() == 'LUT':
                speaker_vec = self.speaker_lut(speakers)
            else:
                speaker_vec = self.ge2e.embed_utterances(mels_for_ge2e)
                if frozen_ge2e:   # pre-trained, not updated (Modules.py:77)
                    speaker_vec = jax.lax.stop_gradient(speaker_vec)
        if cfg.uses_prosody_encoder:
            prosody_vec = self.prosody_encoder(
                mels, mel_lengths, deterministic)
        if cfg.uses_gradient_reversal and prosody_vec is not None:
            classified = self.speaker_classifier(prosody_vec)
        return speaker_vec, prosody_vec, classified

    @staticmethod
    def _duration_condition(speaker_vec, prosody_vec):
        """Sum of available conditioning vectors (``Modules.py:606-610``)."""
        if speaker_vec is None and prosody_vec is None:
            return None
        total = 0
        if speaker_vec is not None:
            total = total + speaker_vec
        if prosody_vec is not None:
            total = total + prosody_vec
        return total

    # -- training forward ---------------------------------------------------

    def __call__(self,
                 tokens: jax.Array,           # [B, T_tok] int32
                 token_lengths: jax.Array,    # [B]
                 mels: jax.Array,             # [B, T_mel, M]
                 mel_lengths: jax.Array,      # [B] (multiples of num_squeeze)
                 speakers: Optional[jax.Array] = None,       # [B] ids
                 mels_for_ge2e: Optional[jax.Array] = None,  # [B·S, T_sl, M]
                 pitches: Optional[jax.Array] = None,        # [B, T_mel]
                 deterministic: bool = True,
                 linear_alignment: bool = False,
                 anchored_alignment: bool = False,
                 em_alignment: bool = False,
                 em_stats=None) -> Dict[str, Any]:
        cfg = self.config
        speaker_vec, prosody_vec, classified = self._conditions(
            mels, mel_lengths, speakers, mels_for_ge2e, deterministic)
        pitch_in = pitches if cfg.uses_gradient_reversal else None

        token_mask = sequence_mask(token_lengths, tokens.shape[1],
                                   mels.dtype)               # [B, T_tok, 1]
        mel_mask = sequence_mask(mel_lengths, mels.shape[1], mels.dtype)

        mean, log_std, log_durations = self.encoder(
            tokens, token_mask,
            self._duration_condition(speaker_vec, prosody_vec),
            deterministic)
        z, log_dets, mel_mask = self.decoder(
            mels, mel_mask, speaker_vec, prosody_vec, pitch_in,
            deterministic=deterministic)

        attn_mask = token_mask * mel_mask[:, None, :, 0]     # [B,T_tok,T_mel]

        mas_backend = cfg.tpu.mas_backend
        if mas_backend not in ('pallas', 'scan'):
            mas_backend = 'scan'  # host backends are not jit-compatible
        if jax.devices()[0].platform != 'tpu' and mas_backend == 'pallas':
            mas_backend = 'scan'

        em_out = {}
        if em_alignment:
            # Warmup curriculum, 'em' mode: closed-form per-token-ID
            # Gaussian EM on stop_grad(z) with an anchored init (see
            # em_alignment_path) + distillation targets for the prior.
            attentions, new_em_stats, distill_mean, distill_log_std = \
                em_alignment_path(
                    tokens, token_lengths, mels, mel_lengths, z,
                    attn_mask, mel_mask,
                    em_stats, cfg.encoder.embedding_tokens,
                    cfg.train.anchor_pause_tokens,
                    cfg.train.anchor_silence_level,
                    cfg.train.em_stats_decay, mas_backend)
            em_out = {'em_stats': new_em_stats,
                      'prior_mean': mean, 'prior_log_std': log_std,
                      'distill_mean': distill_mean,
                      'distill_log_std': distill_log_std,
                      'token_mask': token_mask}
        elif linear_alignment:
            # Warmup curriculum (train.alignment_warmup_steps): skip MAS
            # entirely and supervise against the uniform path.  Static
            # flag → its own jit specialisation, no dead MAS in the graph.
            attentions = linear_alignment_path(
                token_lengths, mel_lengths, attn_mask)
        elif anchored_alignment:
            # Warmup curriculum, 'anchored' mode: MAS over the
            # silence-anchor + guided-diagonal surrogate score (see
            # anchored_alignment_path).  No prior/z statistics involved.
            attentions = jax.lax.stop_gradient(anchored_alignment_path(
                tokens, token_lengths, mels, mel_lengths, attn_mask,
                cfg.train.anchor_pause_tokens,
                cfg.train.anchor_silence_level, mas_backend))
        else:
            # MAS is not differentiated through (reference runs it under
            # no_grad on host); stop-gradient the input statistics.
            log_p = prior_log_likelihood(
                jax.lax.stop_gradient(mean), jax.lax.stop_gradient(log_std),
                jax.lax.stop_gradient(z), attn_mask)
            attentions = jax.lax.stop_gradient(mas_ops.maximum_path(
                log_p, token_lengths, mel_lengths, backend=mas_backend))

        mel_mean = jnp.einsum('bim,bij->bjm', mean,
                              attentions.astype(mean.dtype),
                              preferred_element_type=jnp.float32)
        mel_log_std = jnp.einsum('bim,bij->bjm', log_std,
                                 attentions.astype(log_std.dtype),
                                 preferred_element_type=jnp.float32)
        durations = attentions.sum(axis=-1, keepdims=True)   # [B, T_tok, 1]
        log_duration_targets = jnp.log(durations + 1e-7) * token_mask

        return {
            'z': z,
            'mel_mean': mel_mean,
            'mel_log_std': mel_log_std,
            'log_dets': log_dets,
            'log_durations': log_durations,
            'log_duration_targets': log_duration_targets,
            'attentions': attentions,
            'classified_speakers': classified,
            'mel_mask': mel_mask,
            **em_out,
        }

    def encode_prosody(self, mels, mel_lengths):
        """Expose the GST embedding for the prosody-projector check
        (reference ``Train.py:470-492``)."""
        return self.prosody_encoder(mels, mel_lengths, True)

    # -- inference ----------------------------------------------------------

    def inference(self,
                  tokens: jax.Array,
                  token_lengths: jax.Array,
                  mels_for_prosody: Optional[jax.Array] = None,
                  mel_lengths_for_prosody: Optional[jax.Array] = None,
                  speakers: Optional[jax.Array] = None,
                  mels_for_ge2e: Optional[jax.Array] = None,
                  pitches: Optional[jax.Array] = None,
                  pitch_lengths: Optional[jax.Array] = None,
                  noise_key: Optional[jax.Array] = None,
                  noise_scale: float = 1.0,
                  length_scale=1.0,
                  max_mel_length: int = 1024) -> Dict[str, Any]:
        """Static-shape inference: mels are produced into a [B,
        max_mel_length, M] buffer with per-sample valid lengths (XLA needs
        the capacity at trace time; the reference materialises a dynamic
        max, ``Modules.py:173-175``).

        Composition of :meth:`inference_prior` (token-length work) and
        :meth:`inference_decode` (mel-capacity work) — the serving path
        calls the two phases separately so the decode can run at a
        bucketed capacity chosen from the predicted durations."""
        prior = self.inference_prior(
            tokens, token_lengths, mels_for_prosody,
            mel_lengths_for_prosody, speakers, mels_for_ge2e, length_scale)
        return self.inference_decode(
            prior, pitches=pitches, pitch_lengths=pitch_lengths,
            noise_key=noise_key, noise_scale=noise_scale,
            max_mel_length=max_mel_length)

    def inference_prior(self,
                        tokens: jax.Array,
                        token_lengths: jax.Array,
                        mels_for_prosody: Optional[jax.Array] = None,
                        mel_lengths_for_prosody: Optional[jax.Array] = None,
                        speakers: Optional[jax.Array] = None,
                        mels_for_ge2e: Optional[jax.Array] = None,
                        length_scale=1.0) -> Dict[str, Any]:
        """Phase 1 of serving: conditioning, encoder prior and the scaled
        integer durations — everything shaped by the *token* capacity only.
        The summed durations tell the host how much mel capacity phase 2
        actually needs, so short batches decode in a small static bucket
        instead of the worst-case buffer.

        Per-stage precision scoping (tpu.inference_*_matmul_precision):
        this phase is the encoder stage — everything whose error enters
        the durations directly."""
        cfg = self.config
        with _matmul_precision_scope(
                cfg.tpu.inference_encoder_matmul_precision):
            speaker_vec, prosody_vec, _ = self._conditions(
                mels_for_prosody, mel_lengths_for_prosody, speakers,
                mels_for_ge2e, True, frozen_ge2e=False)

            token_mask = sequence_mask(token_lengths, tokens.shape[1])
            mean, log_std, log_durations = self.encoder(
                tokens, token_mask,
                self._duration_condition(speaker_vec, prosody_vec), True)

            length_scale = jnp.asarray(length_scale, jnp.float32)
            length_scale = jnp.broadcast_to(length_scale.reshape(-1, 1),
                                            log_durations.shape[:2])
            durations = jnp.ceil(
                jnp.exp(log_durations[..., 0].astype(jnp.float32))
                * token_mask[..., 0] * length_scale)         # [B, T_tok]
        return {
            'mean': mean,
            'log_std': log_std,
            'durations': durations,
            'token_mask': token_mask,
            'speaker_vec': speaker_vec,
            'prosody_vec': prosody_vec,
        }

    def inference_decode(self,
                         prior: Dict[str, Any],
                         pitches: Optional[jax.Array] = None,
                         pitch_lengths: Optional[jax.Array] = None,
                         noise_key: Optional[jax.Array] = None,
                         noise_scale: float = 1.0,
                         max_mel_length: int = 1024) -> Dict[str, Any]:
        """Phase 2 of serving: alignment path, z sampling and the inverse
        flow into a ``[B, max_mel_length, M]`` buffer.  ``max_mel_length``
        is a static bucket — the decode FLOPs scale with it, which is the
        point of the two-phase split.  The path/z einsums run under the
        encoder precision stage (their error enters z directly), the
        inverse flow under the decoder stage."""
        cfg = self.config
        mean, log_std = prior['mean'], prior['log_std']
        durations, token_mask = prior['durations'], prior['token_mask']
        speaker_vec = prior.get('speaker_vec')
        prosody_vec = prior.get('prosody_vec')

        with _matmul_precision_scope(
                cfg.tpu.inference_encoder_matmul_precision):
            mel_lengths = jnp.maximum(durations.sum(axis=1), 1.0)
            mel_lengths = jnp.minimum(mel_lengths, max_mel_length)
            # keep the squeeze-truncation exact: round down to num_squeeze
            s = cfg.decoder.num_squeeze
            mel_lengths = (mel_lengths.astype(jnp.int32) // s) * s
            mel_lengths = jnp.maximum(mel_lengths, s)

            mel_mask = sequence_mask(mel_lengths, max_mel_length)
            attn_mask = token_mask * mel_mask[:, None, :, 0]
            attentions = generate_path(durations, attn_mask)

            mel_mean = jnp.einsum('bim,bij->bjm', mean,
                                  attentions.astype(mean.dtype),
                                  preferred_element_type=jnp.float32)
            mel_log_std = jnp.einsum('bim,bij->bjm', log_std,
                                     attentions.astype(log_std.dtype),
                                     preferred_element_type=jnp.float32)

            if noise_key is None:
                noise_key = self.make_rng('noise')
            noise = jax.random.normal(noise_key, mel_mean.shape,
                                      jnp.float32) * noise_scale
            z = (mel_mean + jnp.exp(mel_log_std) * noise) * mel_mask

            pitch_in = None
            if cfg.uses_gradient_reversal and pitches is not None:
                pitch_in = interpolate_pitch(
                    pitches, pitch_lengths, mel_lengths, max_mel_length)

        with _matmul_precision_scope(
                cfg.tpu.inference_decoder_matmul_precision):
            mels, _, mel_mask = self.decoder(
                z.astype(self.dtype or jnp.float32), mel_mask,
                speaker_vec, prosody_vec, pitch_in, reverse=True)
        mels = jnp.where(mel_mask > 0, mels, -cfg.sound.max_abs_mel)

        return {
            'mels': mels,
            'mel_lengths': mel_lengths,
            'attentions': attentions,
            'durations': durations,
        }
