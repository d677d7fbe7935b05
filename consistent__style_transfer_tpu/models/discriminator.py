"""RelGAN multi-representation CNN discriminator (reference
``src/model/discriminator.py``): a bias-free linear "embedding" from
vocab-sized distributions to d=128, viewed as num_rep=16 slices of 8 dims;
per-slice 1-D convs with filters [300,300,300,300] and sizes [2,3,4,5]
(torch ``Conv2d(1, n, (f, 8), stride=(1, 8))``), ReLU, max-pool over time;
highway layer; head to one logit per (sample, rep) -> a flat (B*16,) logit
vector. All parameters use RelGAN's custom N(0, 1/sqrt(dim)) init
(``discriminator.py:53-57``).

The reference materializes a (B, L, V) one-hot for real inputs
(``src/main_optimize.py:117``); here integer inputs take a mathematically
identical embedding-row gather instead (one_hot @ W == W[x]).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .initializers import relgan_init
from .transformer import embed_or_project

EMBED_DIM = 128
NUM_REP = 16
FILTER_SIZES = (2, 3, 4, 5)
NUM_FILTERS = (300, 300, 300, 300)
FEATURE_DIM = sum(NUM_FILTERS)
EMB_DIM_SINGLE = EMBED_DIM // NUM_REP


class RelGANDiscriminator(nn.Module):
    n_vocab: int
    dropout: float = 0.25
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, inp, deterministic: bool = True,
                 time_major: bool = False):
        """inp: int ids (B, L) or distributions (B, L, V) -> logits (B*16,).
        ``time_major``: soft inp is (L, B, V); projection absorbs the relayout."""
        emb_w = self.param("embeddings", relgan_init, (self.n_vocab, EMBED_DIM))
        e = embed_or_project(inp, emb_w.astype(self.dtype),
                             time_major=time_major)                # (B, L, 128)
        B, L = e.shape[0], e.shape[1]
        # (B, L, 16, 8) -> (B, 16, L, 8): each rep slice becomes a conv lane
        e = e.reshape(B, L, NUM_REP, EMB_DIM_SINGLE).transpose(0, 2, 1, 3)
        e = e.reshape(B * NUM_REP, L, EMB_DIM_SINGLE)

        pools = []
        for n_filt, f in zip(NUM_FILTERS, FILTER_SIZES):
            h = nn.Conv(n_filt, kernel_size=(f,), padding="VALID",
                        kernel_init=relgan_init, bias_init=relgan_init,
                        dtype=self.dtype, name=f"conv_{f}")(e)
            h = nn.relu(h)                      # (B*16, L-f+1, n_filt)
            pools.append(jnp.max(h, axis=1))    # (B*16, n_filt)
        pred = jnp.concatenate(pools, axis=-1)  # (B*16, 1200)

        highway = nn.Dense(FEATURE_DIM, kernel_init=relgan_init,
                           bias_init=relgan_init, dtype=self.dtype,
                           name="highway")(pred)
        pred = nn.sigmoid(highway) * nn.relu(highway) + (1.0 - nn.sigmoid(highway)) * pred

        pred = nn.Dropout(self.dropout)(pred, deterministic=deterministic)
        pred = nn.Dense(100, kernel_init=relgan_init, bias_init=relgan_init,
                        dtype=self.dtype, name="feature2out")(pred)
        logits = nn.Dense(1, kernel_init=relgan_init, bias_init=relgan_init,
                          dtype=self.dtype, name="out2logits")(pred)
        return logits[:, 0]
