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
    valid = np.arange(corpus.ids.shape[1])[None, :] < corpus.lengths[:, None]
    counts = np.zeros((2, n_vocab), dtype=np.float64)
    for s in (0, 1):
        rows = corpus.labels == s
        counts[s] = np.bincount(corpus.ids[rows][valid[rows]],
                                minlength=n_vocab)[:n_vocab]
    total = counts[0] + counts[1]
    q = (counts[1] + alpha) / (total + 2.0 * alpha)
    w = 1.0 - np.abs(2.0 * q - 1.0)
    w[total == 0] = 1.0
    w[:3] = 1.0  # PAD/BOS/EOS carry no style
    return w.astype(np.float32)


def mask_stats(corpus: StyleCorpus, weights: np.ndarray) -> dict:
    """Diagnostic for choosing w_copy on a new corpus: how much style
    exemption the mask actually provides. A flat mask (high freq-weighted
    mean) means masked copy degenerates toward uniform copy — scale w_copy
    down (RESULTS.md, book rcm03)."""
    valid = np.arange(corpus.ids.shape[1])[None, :] < corpus.lengths[:, None]
    counts = np.bincount(corpus.ids[valid],
                         minlength=len(weights))[: len(weights)].astype(np.float64)
    total = counts.sum()
    return {
        "freq_weighted_mean_neutrality": float((weights * counts).sum() / total),
        "token_fraction_below_half": float(counts[weights < 0.5].sum() / total),
    }


def main() -> None:  # python -m consistent__style_transfer_tpu.data.style_weights <ds>
    import json
    import sys

    from ..config import make_config
    from ..train.common import get_corpus, get_tokenizer

    cfg = make_config(sys.argv[1] if len(sys.argv) > 1 else "yelp")
    for kv in sys.argv[2:]:  # e.g. data_dir=... dump_dir=... max_len=20
        k, v = kv.split("=", 1)
        cur = getattr(cfg, k)
        if isinstance(cur, bool):
            v = v.lower() in ("1", "true", "yes")
        elif cur is not None and not isinstance(cur, str):
            v = type(cur)(v)
        setattr(cfg, k, v)
    tok = get_tokenizer(cfg)
    corpus = get_corpus(cfg, "train", tok)
    w = style_neutrality_weights(corpus, len(tok))
    print(json.dumps(mask_stats(corpus, w)))


if __name__ == "__main__":
    main()
