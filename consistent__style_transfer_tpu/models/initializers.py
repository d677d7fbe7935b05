"""Initializers matching the torch defaults the reference models train under.

Training dynamics (Adam at small lr, GAN balance) are sensitive to init
scale, so we reproduce the torch schemes the reference inherits implicitly:

- ``torch.nn.Linear``: kaiming_uniform(a=sqrt(5)) == U(±1/sqrt(fan_in)) for
  the weight, U(±1/sqrt(fan_in)) for the bias.
- ``torch.nn.Embedding``: N(0, 1).
- ``torch.nn.LSTM``: U(±1/sqrt(hidden)) for every weight/bias.
- RelGAN's custom init: N(0, 1/sqrt(shape[0])) for every parameter
  (reference ``src/model/discriminator.py:53-57``).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import random


def linear_kernel_init(key, shape, dtype=jnp.float32):
    # flax Dense kernel is (fan_in, fan_out)
    fan_in = shape[0]
    bound = 1.0 / jnp.sqrt(fan_in)
    return random.uniform(key, shape, dtype, -bound, bound)


def linear_bias_init(fan_in: int):
    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / jnp.sqrt(fan_in)
        return random.uniform(key, shape, dtype, -bound, bound)

    return init


def conv_kernel_init(key, shape, dtype=jnp.float32):
    # flax Conv kernel is (*window, fan_in, fan_out); torch kaiming_uniform
    # with a=sqrt(5) gives U(±1/sqrt(fan_in_total)).
    fan_in = 1
    for d in shape[:-1]:
        fan_in *= d
    bound = 1.0 / jnp.sqrt(fan_in)
    return random.uniform(key, shape, dtype, -bound, bound)


def embedding_init(key, shape, dtype=jnp.float32):
    return random.normal(key, shape, dtype)


def lstm_init(hidden: int):
    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / jnp.sqrt(hidden)
        return random.uniform(key, shape, dtype, -bound, bound)

    return init


def relgan_init(key, shape, dtype=jnp.float32):
    # N(0, 1/sqrt(shape[0])) with torch shapes: Linear weight (out, in) ->
    # std uses OUT features; flax kernel is (in, out), so use shape[-1].
    # Conv torch weight (out_ch, in_ch, kh, kw) -> std 1/sqrt(out_ch); flax
    # conv kernel (*win, in, out) -> also shape[-1]. Biases: 1/sqrt(len).
    dim0 = shape[-1] if len(shape) > 1 else shape[0]
    return random.normal(key, shape, dtype) / jnp.sqrt(jnp.asarray(dim0, dtype))


def xavier_uniform(key, shape, dtype=jnp.float32):
    fan_in, fan_out = shape[0], shape[-1]
    bound = jnp.sqrt(6.0 / (fan_in + fan_out))
    return random.uniform(key, shape, dtype, -bound, bound)
