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


def _to_ragged(ids: np.ndarray, lens: np.ndarray) -> list[list[int]]:
    return [ids[i, : lens[i]].tolist() for i in range(len(lens))]


class ExactWmdLabeler:
    def __init__(self, w2v, tokenizer):
        self.w2v = w2v
        self.tokenizer = tokenizer

    def __call__(self, xs1, xs2):
        return self.w2v.cal_wmd_label(xs1, xs2, self.tokenizer)

    def label_pairs(self, ids1, lens1, ids2, lens2):
        """Array-batch entry used by the pipeline collate (exact host OT is
        the parity path; per-row conversion cost is irrelevant next to the LP
        solves)."""
        return self.w2v.cal_wmd_label(_to_ragged(ids1, lens1),
                                      _to_ragged(ids2, lens2), self.tokenizer)


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

    def _histograms(self, ids: np.ndarray, lens: np.ndarray):
        """Vectorized per-row unique-token histograms over w2v rows.

        ``ids`` (B, N) padded BPE ids, ``lens`` (B,). Returns (atom w2v rows
        (B, A) with 0 = padding atom, counts (B, A) float32). Sort each row
        (OOV/pad mapped to 0 sink first), then run-length encode the runs —
        no per-token Python (the old dict-based histogram was 5-8 ms/batch)."""
        B, N = ids.shape
        A = self.max_atoms
        rows = self.lut[ids]
        valid = np.arange(N)[None, :] < lens[:, None]
        srt = np.sort(np.where(valid, rows, 0), axis=1)
        first = np.ones((B, N), dtype=bool)
        first[:, 1:] = srt[:, 1:] != srt[:, :-1]
        first &= srt > 0
        k = np.minimum(first.sum(axis=1), A)
        order = np.argsort(~first, axis=1, kind="stable")  # run starts first
        a = min(A, N)
        pos = order[:, :a].astype(np.int64)
        col = np.arange(a)[None, :]
        in_range = col < k[:, None]
        atom_ids = np.where(in_range, np.take_along_axis(srt, pos, axis=1), 0)
        nxt = np.where(col + 1 < k[:, None],
                       order[:, 1 : a + 1] if a < N
                       else np.concatenate([order[:, 1:], np.full((B, 1), N)], axis=1),
                       N)
        cnt = np.where(in_range, nxt - pos, 0).astype(np.float32)
        if a < A:
            atom_ids = np.pad(atom_ids, ((0, 0), (0, A - a)))
            cnt = np.pad(cnt, ((0, 0), (0, A - a)))
        return atom_ids.astype(np.int32), cnt

    def label_pairs(self, ids1, lens1, ids2, lens2):
        """Array-batch entry used by the pipeline collate; returns a DEVICE
        (B,) array (host fetch here would serialize the collate thread on
        device completion — measured ~60-70 ms/batch on a tunneled chip)."""
        lens1 = np.asarray(lens1, np.int64)
        lens2 = np.asarray(lens2, np.int64)
        a1, c1 = self._histograms(np.asarray(ids1), lens1)
        a2, c2 = self._histograms(np.asarray(ids2), lens2)
        # reference edge cases (src/wmd.py:34-45): empty side -> max(len);
        # no-known-vocab side -> gensim inf -> mean(len)
        empty = (lens1 == 0) | (lens2 == 0)
        no_vocab = (c1.sum(axis=1) == 0) | (c2.sum(axis=1) == 0)
        fallback = np.where(
            empty, np.maximum(lens1, lens2).astype(np.float32),
            np.where(no_vocab, (lens1 + lens2).astype(np.float32) / 2, -1.0),
        ).astype(np.float32)
        # zero out histograms on fallback rows so sinkhorn sees benign inputs
        fb_row = (fallback >= 0)[:, None]
        a1 = np.where(fb_row, 0, a1)
        a2 = np.where(fb_row, 0, a2)
        c1 = np.where(fb_row, 0.0, c1)
        c2 = np.where(fb_row, 0.0, c2)
        cost = _sinkhorn_pairs(self.table[a1], jnp.asarray(c1),
                               self.table[a2], jnp.asarray(c2),
                               epsilon=self.epsilon, n_iters=self.n_iters)
        fb = jnp.asarray(fallback)
        return jnp.where(fb >= 0, fb, cost.astype(jnp.float32))

    def __call__(self, xs1, xs2):
        """Ragged-list entry (tests, tools): aligns and defers to
        :meth:`label_pairs`."""
        n = max([len(x) for x in xs1 + xs2] + [1])
        B = len(xs1)
        ids1 = np.zeros((B, n), np.int32)
        ids2 = np.zeros((B, n), np.int32)
        l1 = np.array([len(x) for x in xs1], np.int64)
        l2 = np.array([len(x) for x in xs2], np.int64)
        for b in range(B):
            ids1[b, : l1[b]] = xs1[b]
            ids2[b, : l2[b]] = xs2[b]
        return self.label_pairs(ids1, l1, ids2, l2)
