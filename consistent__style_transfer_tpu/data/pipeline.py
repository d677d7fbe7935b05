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
from .noise import rand_perm_arrays, transfer_noise_arrays


@dataclass
class Batch:
    arrays: dict[str, np.ndarray]
    valid: int  # number of non-padding rows

    def __getitem__(self, k: str) -> np.ndarray:
        return self.arrays[k]


def _batch_indices(n: int, batch_size: int, shuffle: bool, drop_last: bool,
                   rng: np.random.Generator) -> list[tuple[np.ndarray, int]]:
    """Yields (indices, n_real) per batch; the last partial batch is padded at
    the END by repeating index 0, with n_real recording how many leading rows
    are genuine (a pad index of 0 is indistinguishable from a real 0, so the
    count must be tracked here, not re-derived from the indices)."""
    order = rng.permutation(n) if shuffle else np.arange(n)
    out = []
    for start in range(0, n, batch_size):
        idx = order[start : start + batch_size]
        n_real = len(idx)
        if n_real < batch_size:
            if drop_last:
                break
            pad = np.zeros(batch_size - n_real, dtype=idx.dtype)
            idx = np.concatenate([idx, pad])
        out.append((idx, n_real))
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
        for idx, valid in _batch_indices(n, self.batch_size, self.shuffle,
                                         self.drop_last, rng):
            ids = self.corpus.ids[idx]
            lens = self.corpus.lengths[idx]
            labels = self.corpus.labels[idx]
            yield Batch(self.collate(ids, lens, labels, rng), valid=valid)
        self.epoch += 1

    def __len__(self) -> int:
        n = len(self.corpus)
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)


def collate_optimize(max_len: int):
    def fn(ids, lens, labels, rng):
        return {"x": ids, "labels": labels.astype(np.int32), "lengths": lens}
    return fn


def collate_warmup(max_len: int, p: float = 0.1):
    def fn(ids, lens, labels, rng):
        nx, nlen = transfer_noise_arrays(ids, lens, p=p, rng=rng,
                                         out_len=max_len, pad_id=PAD_ID)
        return {
            "nx": nx, "x": ids, "labels": labels.astype(np.int32),
            "lengths": lens, "nlengths": nlen,
        }
    return fn


def collate_pretrain(max_len: int, wmd_labeler, p: float = 0.15,
                     need_matcher=None):
    """``wmd_labeler.label_pairs(ids1, lens1, ids2, lens2) -> (B,) float32`` —
    either the exact host labeler or the batched on-device Sinkhorn labeler
    (:mod:`consistent__style_transfer_tpu.data.wmd_labels`). Noised rows can
    exceed max_len (insertions); like the reference we keep them at their own
    (static) width ``noise_len = max_len + max(4, max_len // 2)``.

    ``need_matcher`` (nullary callable, default always-True) gates the
    matcher-only batch work: once pretrain's freeze-on-plateau turns the
    matcher off, its inputs — the two transfer_noise variants and the WMD
    label (a per-batch device Sinkhorn solve, the collate's dominant cost) —
    are dead weight for every remaining epoch; zeros of the same
    shape/dtype keep the jit signature stable at ~none of the cost.

    Note the host RNG stream advances differently once gated (the two
    skipped transfer_noise draws no longer consume it), so post-freeze
    rand_perm noise differs from an ungated run at the same seed — a
    deliberate trade: noise draws are augmentation, not a reproducibility
    contract across code versions."""
    noise_len = max_len + max(4, max_len // 2)

    def fn(ids, lens, labels, rng):
        if need_matcher is None or need_matcher():
            nx1, nl1 = transfer_noise_arrays(ids, lens, p=p, rng=rng,
                                             out_len=noise_len, pad_id=PAD_ID)
            nx2, nl2 = transfer_noise_arrays(ids, lens, p=p, rng=rng,
                                             out_len=noise_len, pad_id=PAD_ID)
            # device-resident labelers (Sinkhorn) return jax arrays — keep
            # them on device; host labelers (exact OT) return numpy. Both
            # flow through shard_batch unchanged.
            wmd = wmd_labeler.label_pairs(nx1, nl1, nx2, nl2)
            if isinstance(wmd, np.ndarray):
                wmd = wmd.astype(np.float32)
        else:
            B = len(ids)
            # two separate arrays: the frozen matcher never reads these, but
            # an aliased pair would let an in-place consumer corrupt both
            nx1 = np.zeros((B, noise_len), dtype=ids.dtype)
            nx2 = np.zeros((B, noise_len), dtype=ids.dtype)
            wmd = np.zeros(B, np.float32)
        nx3 = rand_perm_arrays(ids, lens, p=p, rng=rng)
        return {
            "x": ids, "nx1": nx1, "nx2": nx2, "nx3": nx3,
            "labels": labels.astype(np.int32), "wmd": wmd, "lengths": lens,
        }
    return fn


class MegaBatches:
    """Group a :class:`BatchIterator` into stacked (k, B, ...) super-batches
    for the optimize megastep (ONE device dispatch scans k training batches —
    train/optimize.py). The per-batch content and order are untouched, so the
    training trajectory is identical to the per-batch loop; a final partial
    group (n_batches % k) is yielded at its true size (one extra jit
    specialization, compiled once)."""

    def __init__(self, iterator, k: int):
        assert k >= 1
        self.iterator = iterator
        self.k = k

    def __iter__(self) -> Iterator[Batch]:
        buf: list[Batch] = []

        def flush():
            arrays = {key: np.stack([b.arrays[key] for b in buf])
                      for key in buf[0].arrays}
            return Batch(arrays, valid=sum(b.valid for b in buf))

        for batch in self.iterator:
            buf.append(batch)
            if len(buf) == self.k:
                yield flush()
                buf = []
        if buf:
            yield flush()

    def __len__(self) -> int:
        return -(-len(self.iterator) // self.k)


def eval_arrays(batch: Batch) -> dict:
    """Batch arrays + a (B,) ``row_mask`` marking the real rows.

    Partial eval batches are padded up to B by repeating index 0 at the END
    (:func:`_batch_indices`), so the first ``batch.valid`` rows are the real
    ones. Val/eval steps use the mask for masked means, keeping duplicated pad
    rows out of the model-selection signal (the reference keeps ragged final
    batches, ``src/main_optimize.py:127-141``; static shapes force us to pad,
    so the mask restores the same semantics)."""
    arrays = dict(batch.arrays)
    B = len(arrays["labels"])
    arrays["row_mask"] = (np.arange(B) < batch.valid).astype(np.float32)
    return arrays


def make_batches(corpus: StyleCorpus, batch_size: int, max_len: int, stage: str,
                 shuffle: bool, seed: int = 0, wmd_labeler=None, noise_p: float | None = None,
                 need_matcher=None):
    if stage == "optimize":
        collate = collate_optimize(max_len)
    elif stage == "warmup":
        collate = collate_warmup(max_len, p=noise_p if noise_p is not None else 0.1)
    elif stage == "pretrain":
        assert wmd_labeler is not None
        collate = collate_pretrain(max_len, wmd_labeler,
                                   p=noise_p if noise_p is not None else 0.15,
                                   need_matcher=need_matcher)
    else:
        raise ValueError(stage)
    return BatchIterator(corpus, batch_size, max_len, collate, shuffle=shuffle, seed=seed)
