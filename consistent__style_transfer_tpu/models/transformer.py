"""Post-LN Transformer encoder with torch ``nn.TransformerEncoderLayer``
semantics (the backbone of the reference's MLM denoiser and pair Matcher,
``src/model/mlm.py:20-22``, ``src/model/match.py:18-20``): MHA -> dropout ->
residual -> LayerNorm; FFN(2048, relu) -> dropout -> residual -> LayerNorm.

Attention is a plain batched einsum — at d=512 over <=60 tokens the whole
layer fuses into a handful of MXU calls under XLA; sharding enters through
the ``model`` mesh axis via logical sharding constraints on the head and MLP
dimensions (see parallel/sharding.py).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .initializers import linear_bias_init, linear_kernel_init, xavier_uniform


class MultiHeadSelfAttention(nn.Module):
    d_model: int
    n_heads: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        d, h = self.d_model, self.n_heads
        hd = d // h
        qkv = nn.Dense(3 * d, kernel_init=xavier_uniform,
                       bias_init=nn.initializers.zeros, dtype=self.dtype,
                       name="in_proj")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        B, L = x.shape[0], x.shape[1]
        # stay in (B, L, H, hd) layout end to end: the einsums contract the
        # same dims as the classic transpose-to-(B,H,L,hd) formulation, but
        # without explicit transposes XLA folds the head split into the
        # matmuls instead of emitting relayout copies (profiled: the
        # (B,L,H,hd) copies were the largest residual copy-bucket entries
        # in the fused optimize step)
        q = q.reshape(B, L, h, hd)
        k = k.reshape(B, L, h, hd)
        v = v.reshape(B, L, h, hd)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(
            jnp.asarray(hd, self.dtype)
        )
        attn = nn.softmax(scores, axis=-1)
        attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, L, d)
        return nn.Dense(d, kernel_init=linear_kernel_init,
                        bias_init=linear_bias_init(d), dtype=self.dtype,
                        name="out_proj")(out)


class EncoderLayer(nn.Module):
    d_model: int
    n_heads: int
    d_ff: int = 2048
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        attn = MultiHeadSelfAttention(
            self.d_model, self.n_heads, self.dropout, self.dtype, name="self_attn"
        )(x, deterministic)
        x = x + nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        y = nn.Dense(self.d_ff, kernel_init=linear_kernel_init,
                     bias_init=linear_bias_init(self.d_model), dtype=self.dtype,
                     name="linear1")(x)
        y = nn.relu(y)
        y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        y = nn.Dense(self.d_model, kernel_init=linear_kernel_init,
                     bias_init=linear_bias_init(self.d_ff), dtype=self.dtype,
                     name="linear2")(y)
        x = x + nn.Dropout(self.dropout)(y, deterministic=deterministic)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)


class TransformerEncoder(nn.Module):
    n_layers: int
    d_model: int
    n_heads: int
    d_ff: int = 2048
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32
    # remat: recompute each layer in the backward pass instead of saving its
    # activations. Param tree and numerics are unchanged (lifted transform;
    # dropout rngs replay deterministically) — this trades HBM traffic for
    # recompute, targeting the profiled relayout copies of the per-head
    # (B, H, L, L) attention probabilities saved for backward.
    remat: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        layer_cls = EncoderLayer
        if self.remat:
            layer_cls = nn.remat(EncoderLayer, static_argnums=(2,),
                                 prevent_cse=False)
        for i in range(self.n_layers):
            x = layer_cls(self.d_model, self.n_heads, self.d_ff,
                          self.dropout, self.dtype, name=f"layer_{i}")(
                x, deterministic
            )
        return x


def embed_or_project(x, table, dtype=None, time_major=False):
    """Dual input path shared by every model in the zoo (reference pattern,
    e.g. ``src/model/classifier.py:24-27``): integer ids -> row gather; soft
    distributions (B, L, V) -> matmul with the embedding table (identical math
    to one-hot @ table, without materializing the one-hot).

    ``time_major=True``: a SOFT input arrives in the decoder scan's native
    (L, B, V) layout (generator ``time_major_out``); project first, then
    transpose the (L, B, d) result — the same matmul contraction, but the
    relayout moves V/d (33-77x) less data than transposing the probs.
    Integer ids are always batch-major; the flag is ignored for them."""
    if jnp.issubdtype(x.dtype, jnp.integer):
        out = jnp.take(table, x, axis=0)
    else:
        out = x @ table
        if time_major:
            out = jnp.swapaxes(out, 0, 1)  # (L, B, d) -> (B, L, d)
    return out.astype(dtype) if dtype is not None else out
