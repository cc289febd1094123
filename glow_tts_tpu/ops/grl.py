"""Gradient reversal (adversarial speaker scrubbing, GR mode).

JAX-native replacement for the reference's autograd.Function
(``Gradient_Reversal_Layer.py:6-35``): identity forward, gradient scaled by
``-weight`` backward — a two-line ``custom_vjp`` instead of a Module.
"""

from __future__ import annotations

import functools

import jax


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def gradient_reversal(x, weight: float = 1.0):
    return x


def _fwd(x, weight):
    return x, None


def _bwd(weight, _, g):
    return (jax.tree_util.tree_map(lambda t: -weight * t, g),)


gradient_reversal.defvjp(_fwd, _bwd)
