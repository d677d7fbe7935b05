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
    # sizes default to the reference constants (mlm.py:5-7); overridable so
    # CI / the driver's multichip gate can exercise the same code at tiny dims
    d_model: int = D_MODEL
    n_heads: int = N_HEAD
    n_layers: int = N_LAYER
    remat: bool = False  # recompute encoder layers in backward (see matcher.py)

    @nn.compact
    def __call__(self, inputs, deterministic: bool = True):
        # No time_major path: the NT checker only ever consumes hard argmax
        # ids (train/optimize.py val_step), so unlike the CLS/MAT/D scorers
        # it never sees the generator's (L, B, V) soft stacks.
        tok = nn.Embed(self.n_vocab, self.d_model, embedding_init=embedding_init,
                       dtype=self.dtype, name="token_embedding")
        pos = nn.Embed(MAX_POS, self.d_model, embedding_init=xavier_uniform,
                       dtype=self.dtype, name="posit_embedding")
        e = embed_or_project(inputs, tok.embedding.astype(self.dtype))
        e = e + pos(jnp.arange(e.shape[1]))[None, :, :]
        h = TransformerEncoder(self.n_layers, self.d_model, self.n_heads,
                               dtype=self.dtype, remat=self.remat,
                               name="lm")(e, deterministic)
        return nn.Dense(self.n_vocab, kernel_init=linear_kernel_init,
                        bias_init=linear_bias_init(self.d_model), dtype=self.dtype,
                        name="fwd")(h)
