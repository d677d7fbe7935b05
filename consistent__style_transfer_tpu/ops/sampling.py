"""Differentiable sampling ops shared by the generator and the GAN stage.

The straight-through estimator here is the framework-wide primitive the
reference re-implements inline (``src/model/rnn.py:52-53``): forward pass is
one-hot(argmax), backward pass is identity to the input distribution.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def hard_sample_st(probs: jnp.ndarray) -> jnp.ndarray:
    """one_hot(argmax(p)) in the forward pass, d/dp = identity in the backward
    pass (straight-through)."""
    hard = jax.nn.one_hot(jnp.argmax(probs, axis=-1), probs.shape[-1], dtype=probs.dtype)
    return hard - jax.lax.stop_gradient(probs) + probs


def temperature_softmax(logits: jnp.ndarray, tau: float) -> jnp.ndarray:
    """softmax(logits / tau) — the differentiable-decode relaxation
    (reference ``src/model/rnn.py:83``)."""
    return jax.nn.softmax(logits / tau, axis=-1)
