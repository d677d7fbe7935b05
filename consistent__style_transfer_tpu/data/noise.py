"""Corpus-noising ops for the denoising objectives.

Semantics follow the reference's ``src/data_util.py`` exactly, but all
randomness flows through an explicit ``numpy.random.Generator`` so every batch
is reproducible from a seed (the reference used global ``random``/``np.random``
state):

- :func:`transfer_noise` (``src/data_util.py:32-54``): each token is dropped
  into a shared cross-sentence word bag w.p. ``p``; every bagged word is then
  re-inserted into a random sentence (chosen proportional to *original*
  sentence length) at a uniform random position.
- :func:`rand_perm` (``src/data_util.py:56-74``): globally shuffles ~``p`` of
  all tokens across the whole batch, in place.
- :func:`align` (``src/data_util.py:25-30``): truncate + right-pad.

These run on host (they are O(batch tokens) integer ops, not FLOPs); the
device never sees ragged data.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np


def transfer_noise(
    sentences: Sequence[Sequence[int]], p: float, rng: np.random.Generator
) -> list[list[int]]:
    word_bag: list[int] = []
    noised: list[list[int]] = []
    lens = np.array([len(s) for s in sentences], dtype=np.float64)
    for s in sentences:
        drop = rng.uniform(size=len(s)) < p
        kept = [tok for tok, d in zip(s, drop) if not d]
        word_bag.extend(tok for tok, d in zip(s, drop) if d)
        noised.append(kept)
    if not word_bag:
        return noised
    total = lens.sum()
    if total <= 0:
        probs = np.full(len(sentences), 1.0 / max(len(sentences), 1))
    else:
        probs = lens / total
    targets = rng.choice(len(noised), size=len(word_bag), p=probs)
    for tok, idx in zip(word_bag, targets):
        pos = rng.integers(0, len(noised[idx]) + 1)
        noised[idx].insert(pos, tok)
    return noised


def rand_perm(
    sentences: Sequence[Sequence[int]], p: float = 0.15, rng: np.random.Generator | None = None
) -> list[list[int]]:
    if rng is None:
        rng = np.random.default_rng()
    flat: list[int] = []
    lens: list[int] = []
    for s in sentences:
        flat.extend(s)
        lens.append(len(s))
    flat = list(flat)
    sel = np.flatnonzero(rng.uniform(size=len(flat)) < p)
    words = [flat[i] for i in sel]
    order = rng.permutation(len(words))
    for slot, widx in zip(sel, order):
        flat[slot] = words[widx]
    out: list[list[int]] = []
    start = 0
    for n in lens:
        out.append(flat[start : start + n])
        start += n
    return out


def align(
    sentences: Sequence[Sequence[int]], pad_value: int, max_len: int
) -> tuple[np.ndarray, np.ndarray]:
    """Truncate + right-pad to a *static* ``max_len`` (the reference pads to
    the batch max; static shapes avoid XLA recompilation). Returns
    (ids (B, max_len) int32, lengths (B,) int32)."""
    B = len(sentences)
    ids = np.full((B, max_len), pad_value, dtype=np.int32)
    lengths = np.zeros(B, dtype=np.int32)
    for i, s in enumerate(sentences):
        s = list(s)[:max_len]
        ids[i, : len(s)] = s
        lengths[i] = len(s)
    return ids, lengths
