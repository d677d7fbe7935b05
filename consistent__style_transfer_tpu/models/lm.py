"""Transformer LM denoiser / naturalness checker (reference ``src/model/mlm.py``):
6-layer, 8-head, d=512 bidirectional transformer encoder over token + learned
positional embeddings (position table capped at 100, ``mlm.py:14``), linear
head to vocab logits. The reference's style embedding is deliberately disabled
(``mlm.py:15,36-37``) and stays out here. Dual hard/soft input path
(``mlm.py:28-33``)."""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .initializers import embedding_init, linear_bias_init, linear_kernel_init, xavier_uniform
from .transformer import TransformerEncoder, embed_or_project

D_MODEL = 512
N_HEAD = 8
N_LAYER = 6
MAX_POS = 100


class TransformerLM(nn.Module):
    n_vocab: int
    n_class: int = 2  # kept for constructor parity; unused like the reference
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs, deterministic: bool = True):
        tok = nn.Embed(self.n_vocab, D_MODEL, embedding_init=embedding_init,
                       dtype=self.dtype, name="token_embedding")
        pos = nn.Embed(MAX_POS, D_MODEL, embedding_init=xavier_uniform,
                       dtype=self.dtype, name="posit_embedding")
        L = inputs.shape[1]
        e = embed_or_project(inputs, tok.embedding.astype(self.dtype))
        e = e + pos(jnp.arange(L))[None, :, :]
        h = TransformerEncoder(N_LAYER, D_MODEL, N_HEAD, dtype=self.dtype,
                               name="lm")(e, deterministic)
        return nn.Dense(self.n_vocab, kernel_init=linear_kernel_init,
                        bias_init=linear_bias_init(D_MODEL), dtype=self.dtype,
                        name="fwd")(h)
