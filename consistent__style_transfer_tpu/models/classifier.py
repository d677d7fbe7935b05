"""Kim-CNN style classifier (reference ``src/model/classifier.py``): embedding
d=128, parallel 1-D convs with kernel sizes (3,4,5) x 128 filters and full
time-padding (torch ``padding=(size-1, 0)`` pads both ends), ReLU, global
max-pool over time, dropout 0.5, linear to n_class. Dual hard/soft input
(``classifier.py:24-27``): soft (B, L, V) inputs are projected through the
embedding table (equivalent to one-hot @ table)."""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .initializers import (
    conv_kernel_init,
    embedding_init,
    linear_bias_init,
    linear_kernel_init,
)
from .transformer import embed_or_project

D_EMBED = 128
P_DROP = 0.5
KERNELS = (3, 4, 5)
N_FILTERS = (128, 128, 128)


class TextCNN(nn.Module):
    n_vocab: int
    n_class: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True,
                 time_major: bool = False):
        emb = nn.Embed(self.n_vocab, D_EMBED, embedding_init=embedding_init,
                       dtype=self.dtype, name="embedding")
        # time_major: soft x arrives (L, B, V); projection absorbs the relayout
        e = embed_or_project(x, emb.embedding.astype(self.dtype),
                             time_major=time_major)  # (B, L, E)

        pooled = []
        for size, n_filt in zip(KERNELS, N_FILTERS):
            bias_fan_in = size * D_EMBED
            h = nn.Conv(
                n_filt, kernel_size=(size,), padding=[(size - 1, size - 1)],
                kernel_init=conv_kernel_init,
                bias_init=linear_bias_init(bias_fan_in),
                dtype=self.dtype, name=f"conv_{size}",
            )(e)                                   # (B, L+size-1, n_filt)
            h = nn.relu(h)
            pooled.append(jnp.max(h, axis=1))      # (B, n_filt)
        feats = jnp.concatenate(pooled, axis=-1)   # (B, sum filters)
        feats = nn.Dropout(P_DROP)(feats, deterministic=deterministic)
        return nn.Dense(self.n_class, kernel_init=linear_kernel_init,
                        bias_init=linear_bias_init(sum(N_FILTERS)),
                        dtype=self.dtype, name="out")(feats)
