"""WMD regression labels for Matcher pretraining.

The reference computes an exact per-pair Word-Mover's Distance with gensim on
CPU inside the collate function (``src/loader.py:60`` -> ``src/wmd.py:34-45``)
— its single biggest data-path bottleneck. Two TPU-native labelers:

- :class:`ExactWmdLabeler` — host-side exact OT (parity path, used for tests
  and small runs).
- :class:`SinkhornWmdLabeler` — one jitted batched Sinkhorn solve per batch on
  device: histograms over each pair's union of w2v-known tokens, euclidean
  ground metric over L2-normalized vectors, with the reference's edge-case
  semantics (empty side -> max(len); no-vocab side -> mean(len)).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.emd import sinkhorn_ot_cost


class ExactWmdLabeler:
    def __init__(self, w2v, tokenizer):
        self.w2v = w2v
        self.tokenizer = tokenizer

    def __call__(self, xs1, xs2):
        return self.w2v.cal_wmd_label(xs1, xs2, self.tokenizer)


@partial(jax.jit, static_argnames=("epsilon", "n_iters"))
def _sinkhorn_pairs(vecs1, cnt1, vecs2, cnt2, epsilon=0.05, n_iters=100):
    """vecs*: (B, N, D) gathered unique-token vectors; cnt*: (B, N) counts
    (0 = padding atom). Returns (B,) transport costs."""
    p = cnt1 / jnp.maximum(jnp.sum(cnt1, axis=-1, keepdims=True), 1e-9)
    q = cnt2 / jnp.maximum(jnp.sum(cnt2, axis=-1, keepdims=True), 1e-9)
    diff = vecs1[:, :, None, :] - vecs2[:, None, :, :]
    D = jnp.sqrt(jnp.maximum(jnp.sum(diff * diff, axis=-1), 1e-12))
    return sinkhorn_ot_cost(p, q, D, epsilon=epsilon, n_iters=n_iters)


class SinkhornWmdLabeler:
    """Batched on-device WMD labels.

    Args:
      w2v: trained :class:`~consistent__style_transfer_tpu.text.word2vec.Word2Vec`
        over BPE token strings (vectors are L2-normalized here, matching
        ``init_sims(replace=True)`` in the reference ``src/wmd.py:54``).
      tokenizer: BPE tokenizer (provides id -> token strings).
      max_atoms: static unique-token capacity per side (>= max noised length).
    """

    def __init__(self, w2v, tokenizer, max_atoms: int = 48,
                 epsilon: float = 0.05, n_iters: int = 100):
        self.max_atoms = max_atoms
        self.epsilon = epsilon
        self.n_iters = n_iters
        V = len(tokenizer)
        # BPE id -> w2v row (+1, with 0 = OOV sentinel row of zeros).
        lut = np.zeros(V, dtype=np.int32)
        for bpe_id in range(V):
            tok = tokenizer.inv_vocab.get(bpe_id)
            row = w2v.vocab.get(tok, -1) if tok is not None else -1
            lut[bpe_id] = row + 1
        self.lut = lut
        vecs = np.asarray(w2v.vectors, dtype=np.float32)
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        vecs = vecs / np.maximum(norms, 1e-12)
        self.table = jnp.asarray(
            np.concatenate([np.zeros((1, vecs.shape[1]), np.float32), vecs], axis=0)
        )

    def _histogram(self, sent: list[int]):
        rows = [int(self.lut[t]) for t in sent if self.lut[t] > 0]
        uniq: dict[int, int] = {}
        for r in rows:
            uniq[r] = uniq.get(r, 0) + 1
        ids = np.zeros(self.max_atoms, dtype=np.int32)
        cnt = np.zeros(self.max_atoms, dtype=np.float32)
        for i, (r, c) in enumerate(list(uniq.items())[: self.max_atoms]):
            ids[i] = r
            cnt[i] = c
        return ids, cnt

    def __call__(self, xs1, xs2):
        B = len(xs1)
        ids1 = np.zeros((B, self.max_atoms), np.int32)
        cnt1 = np.zeros((B, self.max_atoms), np.float32)
        ids2 = np.zeros((B, self.max_atoms), np.int32)
        cnt2 = np.zeros((B, self.max_atoms), np.float32)
        fallback = np.full(B, -1.0, np.float32)
        for b, (x1, x2) in enumerate(zip(xs1, xs2)):
            if len(x1) == 0 or len(x2) == 0:
                fallback[b] = float(max(len(x1), len(x2)))
                continue
            i1, c1 = self._histogram(x1)
            i2, c2 = self._histogram(x2)
            if c1.sum() == 0 or c2.sum() == 0:  # gensim returns inf -> mean(len)
                fallback[b] = (len(x1) + len(x2)) / 2
                continue
            ids1[b], cnt1[b], ids2[b], cnt2[b] = i1, c1, i2, c2
        vecs1 = self.table[ids1]
        vecs2 = self.table[ids2]
        cost = _sinkhorn_pairs(vecs1, cnt1, vecs2, cnt2,
                               epsilon=self.epsilon, n_iters=self.n_iters)
        # stay on device: the labels feed straight into the (device) pretrain
        # step, so a host fetch here would cross the host<->device link twice
        # per batch and serialize the collate thread on device completion —
        # measured at ~60-70 ms/batch on a tunneled chip (RESULTS.md).
        fb = jnp.asarray(fallback)
        return jnp.where(fb >= 0, fb, cost.astype(jnp.float32))
