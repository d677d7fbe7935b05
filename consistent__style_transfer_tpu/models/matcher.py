"""BERT-style pair Matcher / content-preservation regressor (reference
``src/model/match.py``): shared token + learned positional + segment
embeddings; the two sentences are *concatenated along time* with segment ids
0/1 and positions restarting per segment; 6-layer/8-head/d=512 transformer
encoder; max-pool over time; linear to a scalar score. Trained to regress WMD
(pretrain) and pushed toward ``--gap`` during optimize."""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .initializers import embedding_init, linear_bias_init, linear_kernel_init
from .transformer import TransformerEncoder, embed_or_project

D_MODEL = 512
N_HEAD = 8
N_LAYER = 6
MAX_POS = 100


class PairMatcher(nn.Module):
    n_vocab: int
    dtype: jnp.dtype = jnp.float32
    # sizes default to the reference constants (match.py:10-42); overridable
    # so CI / the driver's multichip gate can exercise the code at tiny dims
    d_model: int = D_MODEL
    n_heads: int = N_HEAD
    n_layers: int = N_LAYER
    # remat the encoder layers: recompute each layer in backward instead of
    # saving its activations (incl. the per-head (B, H, L, L) attention
    # probabilities). Numerics are unchanged (lifted transform; dropout rngs
    # replay). Measured noise-level on the fused optimize step at yelp scale
    # (RESULTS.md "remat scorers A/B") — a memory lever, not a speed lever.
    remat: bool = False

    @nn.compact
    def __call__(self, x1, x2, deterministic: bool = True,
                 time_major: bool = False):
        """``time_major``: x1 is a soft (L, B, V) decode stack (generator
        ``time_major_out``); the V->d projection absorbs the relayout. x2 is
        always batch-major ids. Dims are read off the post-projection
        embedding (always (B, L, d)), so both layouts share one path."""
        tok = nn.Embed(self.n_vocab, self.d_model, embedding_init=embedding_init,
                       dtype=self.dtype, name="token_embedding")
        pos = nn.Embed(MAX_POS, self.d_model, embedding_init=embedding_init,
                       dtype=self.dtype, name="posit_embedding")
        seg = nn.Embed(2, self.d_model, embedding_init=embedding_init,
                       dtype=self.dtype, name="segment_embedding")
        table = tok.embedding.astype(self.dtype)

        def embed(x, seg_id, tm=False):
            e = embed_or_project(x, table, time_major=tm)
            e = e + pos(jnp.arange(e.shape[1]))[None, :, :]
            return e + seg(jnp.full((e.shape[0],), seg_id, jnp.int32))[:, None, :]

        h = jnp.concatenate([embed(x1, 0, time_major), embed(x2, 1)], axis=1)
        h = TransformerEncoder(self.n_layers, self.d_model, self.n_heads,
                               dtype=self.dtype, remat=self.remat,
                               name="matcher")(h, deterministic)
        pooled = jnp.max(h, axis=1)
        out = nn.Dense(1, kernel_init=linear_kernel_init,
                       bias_init=linear_bias_init(self.d_model), dtype=self.dtype,
                       name="hidden2logits")(pooled)
        return out[:, 0]
