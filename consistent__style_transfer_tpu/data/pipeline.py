"""Batch pipeline: ragged host data -> fixed-shape arrays for XLA.

Replaces the reference's torch ``DataLoader`` + collate closures
(``src/loader.py:46-90``) with plain, seeded numpy batch iterators. Every
batch has the same static shape (B, max_len) so each stage's train step
compiles exactly once. The last partial batch is padded up to B with repeated
samples and a ``valid`` count so evaluation/inference can discard padding on
host; training iterators drop the partial batch instead (standard practice;
the reference kept it, which only perturbs the final SGD step of each epoch).

Stage batch layouts (matching reference collates):
- optimize (``src/loader.py:84-90``): (x, labels)
- warmup   (``src/loader.py:72-82``): (noised x @ p=0.1, x, labels)
- pretrain (``src/loader.py:46-70``): (x, noise1, noise2, perm-noise, labels,
  wmd_label) with two independent transfer_noise(p=0.15) draws + one
  rand_perm(0.15) and per-pair WMD labels between the two noised variants.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Iterator

import numpy as np

from .. import PAD_ID
from .corpus import StyleCorpus
from .noise import align, rand_perm, transfer_noise


@dataclass
class Batch:
    arrays: dict[str, np.ndarray]
    valid: int  # number of non-padding rows

    def __getitem__(self, k: str) -> np.ndarray:
        return self.arrays[k]


def _batch_indices(n: int, batch_size: int, shuffle: bool, drop_last: bool,
                   rng: np.random.Generator) -> list[np.ndarray]:
    order = rng.permutation(n) if shuffle else np.arange(n)
    out = []
    for start in range(0, n, batch_size):
        idx = order[start : start + batch_size]
        if len(idx) < batch_size:
            if drop_last:
                break
            pad = np.zeros(batch_size - len(idx), dtype=idx.dtype)
            idx = np.concatenate([idx, pad])
        out.append(idx)
    return out


class BatchIterator:
    """Re-iterable epoch iterator; each epoch reshuffles deterministically."""

    def __init__(
        self,
        corpus: StyleCorpus,
        batch_size: int,
        max_len: int,
        collate: Callable[[list[list[int]], np.ndarray, np.random.Generator], dict],
        shuffle: bool = True,
        drop_last: bool | None = None,
        seed: int = 0,
    ):
        self.corpus = corpus
        self.batch_size = batch_size
        self.max_len = max_len
        self.collate = collate
        self.shuffle = shuffle
        self.drop_last = shuffle if drop_last is None else drop_last
        self.seed = seed
        self.epoch = 0

    def __iter__(self) -> Iterator[Batch]:
        rng = np.random.default_rng((self.seed, self.epoch))
        n = len(self.corpus)
        for idx in _batch_indices(n, self.batch_size, self.shuffle, self.drop_last, rng):
            valid = int(np.sum(idx < n)) if not self.drop_last else len(idx)
            sents = [self.corpus.sentences[i] for i in idx]
            labels = self.corpus.labels[idx]
            yield Batch(self.collate(sents, labels, rng), valid=min(valid, len(idx)))
        self.epoch += 1

    def __len__(self) -> int:
        n = len(self.corpus)
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)


def collate_optimize(max_len: int):
    def fn(sents, labels, rng):
        x, lengths = align(sents, PAD_ID, max_len)
        return {"x": x, "labels": labels.astype(np.int32), "lengths": lengths}
    return fn


def collate_warmup(max_len: int, p: float = 0.1):
    def fn(sents, labels, rng):
        noised = transfer_noise(sents, p=p, rng=rng)
        nx, nlen = align(noised, PAD_ID, max_len)
        x, lengths = align(sents, PAD_ID, max_len)
        return {
            "nx": nx, "x": x, "labels": labels.astype(np.int32),
            "lengths": lengths, "nlengths": nlen,
        }
    return fn


def collate_pretrain(max_len: int, wmd_labeler, p: float = 0.15):
    """``wmd_labeler(noised1, noised2) -> (B,) float32`` — either the exact
    host labeler or the batched on-device Sinkhorn labeler
    (:mod:`consistent__style_transfer_tpu.data.wmd_labels`). Noised sentences
    can exceed max_len (insertions); like the reference, we align them at
    their own max (but statically: 2*max_len covers every possible insertion
    pattern bounded by total batch tokens... in practice len <= max_len + bag;
    we clamp to noise_len)."""
    noise_len = max_len + max(4, max_len // 2)

    def fn(sents, labels, rng):
        n1 = transfer_noise(sents, p=p, rng=rng)
        n2 = transfer_noise(sents, p=p, rng=rng)
        n3 = rand_perm(sents, p=p, rng=rng)
        x, lengths = align(sents, PAD_ID, max_len)
        nx1, _ = align(n1, PAD_ID, noise_len)
        nx2, _ = align(n2, PAD_ID, noise_len)
        nx3, _ = align(n3, PAD_ID, max_len)  # rand_perm preserves lengths
        # device-resident labelers (Sinkhorn) return jax arrays — keep them
        # on device; host labelers (exact OT) return numpy. Both flow through
        # shard_batch unchanged.
        wmd = wmd_labeler(n1, n2)
        if isinstance(wmd, np.ndarray):
            wmd = wmd.astype(np.float32)
        return {
            "x": x, "nx1": nx1, "nx2": nx2, "nx3": nx3,
            "labels": labels.astype(np.int32), "wmd": wmd, "lengths": lengths,
        }
    return fn


def make_batches(corpus: StyleCorpus, batch_size: int, max_len: int, stage: str,
                 shuffle: bool, seed: int = 0, wmd_labeler=None, noise_p: float | None = None):
    if stage == "optimize":
        collate = collate_optimize(max_len)
    elif stage == "warmup":
        collate = collate_warmup(max_len, p=noise_p if noise_p is not None else 0.1)
    elif stage == "pretrain":
        assert wmd_labeler is not None
        collate = collate_pretrain(max_len, wmd_labeler, p=noise_p if noise_p is not None else 0.15)
    else:
        raise ValueError(stage)
    return BatchIterator(corpus, batch_size, max_len, collate, shuffle=shuffle, seed=seed)
