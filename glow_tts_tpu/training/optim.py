"""Optimizer and LR schedule as optax transforms.

* :func:`scale_by_radam_ref` — Rectified Adam reproducing the reference's
  update math exactly (``Radam.py:25-90``): moments in float32, the
  N_sma≥5 switch between the rectified sqrt-denominator update and the
  bias-corrected momentum-only update, and eps added to the *uncorrected*
  √v (optax's built-in ``scale_by_radam`` adds eps after bias correction —
  a small but real numerical difference).
* :func:`modified_noam_schedule` — warmup-free Noam decay
  ``base^0.5 · (step + base)^-0.5`` (``Noam_Scheduler.py:17-29``).
* :func:`make_optimizer` — clip-by-global-norm 5.0 → RAdam → decoupled
  weight decay scaled by lr (the reference applies ``p -= wd·lr·p``,
  ``Radam.py:78-79``) → lr schedule; parameters whose path contains a
  frozen prefix (the pre-trained GE2E encoder) are masked out entirely.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from glow_tts_tpu.config import Config


class RAdamState(NamedTuple):
    count: jax.Array
    mu: Any
    nu: Any


def scale_by_radam_ref(b1: float = 0.9, b2: float = 0.999,
                       eps: float = 1e-8) -> optax.GradientTransformation:
    def init_fn(params):
        zeros = lambda t: jnp.zeros_like(t, dtype=jnp.float32)
        return RAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree_util.tree_map(zeros, params),
            nu=jax.tree_util.tree_map(zeros, params))

    def update_fn(updates, state, params=None):
        del params
        count = state.count + 1
        t = count.astype(jnp.float32)
        mu = jax.tree_util.tree_map(
            lambda m, g: b1 * m + (1 - b1) * g.astype(jnp.float32),
            state.mu, updates)
        nu = jax.tree_util.tree_map(
            lambda v, g: b2 * v + (1 - b2) * jnp.square(g.astype(jnp.float32)),
            state.nu, updates)

        beta2_t = b2 ** t
        n_sma_max = 2.0 / (1.0 - b2) - 1.0
        n_sma = n_sma_max - 2.0 * t * beta2_t / (1.0 - beta2_t)
        rect = jnp.sqrt(
            jnp.clip((1.0 - beta2_t) * (n_sma - 4.0) / (n_sma_max - 4.0)
                     * (n_sma - 2.0) / n_sma * n_sma_max / (n_sma_max - 2.0),
                     0.0))
        bias1 = 1.0 - b1 ** t
        step_rect = rect / bias1
        step_plain = 1.0 / bias1
        use_rect = n_sma >= 5.0

        def scaled(m, v):
            rectified = step_rect * m / (jnp.sqrt(v) + eps)
            plain = step_plain * m
            return jnp.where(use_rect, rectified, plain)

        new_updates = jax.tree_util.tree_map(scaled, mu, nu)
        return new_updates, RAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)


def modified_noam_schedule(initial: float, base: int) -> Callable:
    def schedule(count):
        step = jnp.maximum(count.astype(jnp.float32), 1.0)
        return initial * base ** 0.5 * (step + base) ** -0.5
    return schedule


def noam_schedule(initial: float, warmup_steps: int) -> Callable:
    """Classic Noam warmup/decay (``Noam_Scheduler.py:5-15``; present but
    unused in the reference config — kept for schedule parity)."""
    def schedule(count):
        step = jnp.maximum(count.astype(jnp.float32), 1.0)
        scale = warmup_steps ** 0.5 * jnp.minimum(
            step ** -0.5, step * warmup_steps ** -1.5)
        return initial * scale
    return schedule


def make_optimizer(config: Config,
                   frozen_prefixes: tuple = ('ge2e',)
                   ) -> optax.GradientTransformation:
    train = config.train
    schedule = modified_noam_schedule(train.learning_rate.initial,
                                      train.learning_rate.base)
    core = optax.chain(
        optax.clip_by_global_norm(train.gradient_norm),
        scale_by_radam_ref(train.adam.beta1, train.adam.beta2,
                           train.adam.epsilon),
        optax.add_decayed_weights(train.weight_decay),
        optax.scale_by_learning_rate(schedule),   # negates for descent
    )

    def is_frozen(path) -> bool:
        keys = [getattr(p, 'key', getattr(p, 'name', str(p))) for p in path]
        return any(k in frozen_prefixes for k in keys)

    def label_params(params):
        return jax.tree_util.tree_map_with_path(
            lambda path, _: 'frozen' if is_frozen(path) else 'train', params)

    return optax.multi_transform(
        {'train': core, 'frozen': optax.set_to_zero()}, label_params)


def learning_rate_at(config: Config, step) -> jax.Array:
    """LR actually applied at optimizer step ``step`` (for logging parity
    with the reference's ``scheduler.get_last_lr()``, ``Train.py:251``)."""
    schedule = modified_noam_schedule(config.train.learning_rate.initial,
                                      config.train.learning_rate.base)
    return schedule(jnp.asarray(step))
