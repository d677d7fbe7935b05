"""Corpus loading: eager BPE-encode of style files into memory.

Mirrors the reference dataset contract (``src/loader.py:10-40``): one sentence
per line; the style label is the filename suffix (``style.train.0`` -> 0);
sentences are BPE-encoded and truncated to ``max_len`` at load time; empty
lines are dropped.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np


def load_s2l(path: str, encode_fn) -> list[tuple[list[int], int]]:
    """Load (encoded sentence, label) pairs; label parsed from the filename
    suffix (reference ``src/loader.py:34-40``)."""
    assert os.path.exists(path), path
    label = int(path.split(".")[-1])
    with open(path, "r", encoding="utf-8") as f:
        sentences = [line.strip() for line in f]
    return [(encode_fn(s), label) for s in sentences if s]


@dataclass
class StyleCorpus:
    """All sentences of one split, eagerly encoded."""

    sentences: list[list[int]]
    labels: np.ndarray  # (N,) int32

    @classmethod
    def from_files(cls, files, tokenizer, max_len: int) -> "StyleCorpus":
        samples: list[tuple[list[int], int]] = []
        for path in files:
            samples += load_s2l(path, lambda s: tokenizer.encode(s)[:max_len])
        sentences = [s for s, _ in samples]
        labels = np.array([l for _, l in samples], dtype=np.int32)
        return cls(sentences, labels)

    def __len__(self) -> int:
        return len(self.sentences)
