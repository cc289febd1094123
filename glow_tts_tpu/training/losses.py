"""Training losses, computed in float32.

* :func:`mle_loss` — exact flow likelihood (reference ``Modules.py:1020-1029``
  and the normalisation discussion it cites): per-element negative
  log-likelihood of z under the aligned prior minus the flow
  log-determinants, normalised by the valid frame count × mel channels,
  plus the ½·log 2π constant.
* :func:`duration_loss` — MSE between predicted and MAS-derived log
  durations (``Train.py:210``; torch ``MSELoss`` mean-over-all-elements
  semantics, padding included — both tensors are masked to zero there).
* :func:`speaker_ce_loss` — adversarial classifier cross-entropy (GR mode,
  ``Train.py:214-216``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

LOG_2PI = 1.8378770664093453


def mle_loss(z, mel_mean, mel_log_std, log_dets, mel_lengths,
             num_squeeze: int, mel_dim: int):
    z = z.astype(jnp.float32)
    mean = mel_mean.astype(jnp.float32)
    log_std = mel_log_std.astype(jnp.float32)
    nll = (jnp.sum(log_std)
           + 0.5 * jnp.sum(jnp.exp(-2.0 * log_std) * (z - mean) ** 2)
           - jnp.sum(log_dets.astype(jnp.float32)))
    denom = jnp.sum(mel_lengths // num_squeeze) * num_squeeze * mel_dim
    return nll / denom + 0.5 * LOG_2PI


def duration_loss(log_durations, log_duration_targets):
    diff = (log_durations.astype(jnp.float32)
            - log_duration_targets.astype(jnp.float32))
    return jnp.mean(diff ** 2)


def prior_distill_loss(prior_mean, prior_log_std,
                       distill_mean, distill_log_std, token_mask):
    """Masked MSE regressing the network prior's (mean, log_std) onto the
    closed-form EM table ('em' alignment warmup,
    models/glow_tts.py:em_alignment_path).  Plain MSE on purpose: the MLE
    gradient w.r.t. the mean is preconditioned by exp(-2·log_std), which
    is what lets SGD underfit the prior (measured: table 0.9984 vs
    network 0.5336 MAS accuracy on the same z); the distillation target
    is the closed-form optimum, so an unconditioned regression is exact.
    No reference analogue (the reference has no warmup)."""
    m = token_mask.astype(jnp.float32)
    n = jnp.maximum(jnp.sum(m), 1.0) * prior_mean.shape[-1]
    d_mean = (prior_mean.astype(jnp.float32) - distill_mean) * m
    d_std = (prior_log_std.astype(jnp.float32) - distill_log_std) * m
    return (jnp.sum(d_mean ** 2) + jnp.sum(d_std ** 2)) / n


def speaker_ce_loss(logits, speaker_ids):
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    picked = jnp.take_along_axis(logp, speaker_ids[:, None], axis=-1)
    return -jnp.mean(picked)
