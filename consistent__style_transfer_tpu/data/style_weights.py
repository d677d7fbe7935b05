"""Per-token style-neutrality weights for the masked copy regularizer.

Motivation (round-2 CP experiments, RESULTS.md): a uniform copy loss on the
transfer distribution (Config.w_copy) preserves structure but also pins the
style-bearing words, collapsing transfer accuracy (cp_copy03: ACC 0.97 ->
0.47). The fix is to weight the copy NLL by how style-NEUTRAL each vocab
token is in the training corpus, so function/content words feel full copy
pressure while polarized style words ("worse", "amazing", ...) are left free
for the style CE to flip. This is corpus statistics only — no reference
equivalent (the reference gets its copying bias from DAE training on ~270k
real sentences per style, ``/root/reference/src/main_warmup.py``).

The weight for token t is ``1 - |2*q_t - 1|`` where ``q_t = P(style=1 | t)``
with add-alpha smoothing: 1.0 for style-balanced tokens, -> 0 for tokens
that appear in only one style. Same statistic family as the evaluation
lexicon's log-odds selection (``evaluate/lexicon.py``), kept separate so the
training path never touches eval artifacts.
"""

from __future__ import annotations

import numpy as np

from .corpus import StyleCorpus


def style_neutrality_weights(corpus: StyleCorpus, n_vocab: int,
                             alpha: float = 1.0) -> np.ndarray:
    """(n_vocab,) float32 in [0, 1]; specials (PAD/BOS/EOS) and unseen
    tokens get weight 1.0 (fully neutral)."""
    counts = np.zeros((2, n_vocab), dtype=np.float64)
    for ids, label in zip(corpus.sentences, corpus.labels):
        np.add.at(counts[int(label)], np.asarray(ids, dtype=np.int64), 1.0)
    total = counts[0] + counts[1]
    q = (counts[1] + alpha) / (total + 2.0 * alpha)
    w = 1.0 - np.abs(2.0 * q - 1.0)
    w[total == 0] = 1.0
    w[:3] = 1.0  # PAD/BOS/EOS carry no style
    return w.astype(np.float32)
