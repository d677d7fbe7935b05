"""Corpus loading: eager BPE-encode of style files into fixed-shape arrays.

Mirrors the reference dataset contract (``src/loader.py:10-40``): one sentence
per line; the style label is the filename suffix (``style.train.0`` -> 0);
sentences are BPE-encoded and truncated to ``max_len`` at load time; empty
lines are dropped.

TPU-native storage: the corpus lives as one padded ``(N, max_len)`` int32
array + per-row lengths (not ragged Python lists), so batch assembly is pure
numpy fancy indexing and the noising ops run vectorized over arrays. Loading
goes through the C++ batch encoder (``native/tpust.cc::tpust_bpe_encode_batch``)
when the runtime is built — one ctypes call per file instead of one Python
``encode()`` per line, which is what makes 270k-sentences/style corpora load
in seconds.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np


def _read_lines(path: str) -> tuple[list[str], int]:
    """Non-empty lines + the label parsed from the filename suffix
    (reference ``src/loader.py:34-40``)."""
    assert os.path.exists(path), path
    label = int(path.split(".")[-1])
    with open(path, "r", encoding="utf-8") as f:
        lines = [line.strip() for line in f]
    return [l for l in lines if l], label


def validate_style_file(path: str) -> dict:
    """Validate a (possibly real/user-provided) corpus file against the
    reference's drop-in contract (``src/loader.py:10-40``): filename suffix
    parses as the integer style id, UTF-8 text, one sentence per line, at
    least one non-empty line. Returns stats the caller can log — this is the
    tested seam for swapping real ``style.train.{0,1}`` corpora in for the
    committed synthetic stand-ins.

    Raises ``ValueError`` with an actionable message on contract violations
    (loading would otherwise fail later or — worse — silently train on an
    empty split)."""
    if not os.path.exists(path):
        raise ValueError(f"corpus file missing: {path}")
    suffix = path.split(".")[-1]
    try:
        label = int(suffix)
    except ValueError:
        raise ValueError(
            f"{path}: filename must end in the integer style id "
            "(style.<split>.<label>, reference src/loader.py:34-40); "
            f"got suffix {suffix!r}") from None
    try:
        lines, _ = _read_lines(path)
    except UnicodeDecodeError as e:
        raise ValueError(f"{path}: not valid UTF-8 text ({e})") from None
    if not lines:
        raise ValueError(f"{path}: no non-empty lines — training on an "
                         "empty split would silently produce a dead model")
    n_tok = [len(l.split()) for l in lines]
    return {
        "label": label,
        "n_lines": len(lines),
        "max_words": max(n_tok),
        "mean_words": round(sum(n_tok) / len(n_tok), 2),
    }


def load_s2l(path: str, encode_fn) -> list[tuple[list[int], int]]:
    """Ragged (encoded sentence, label) pairs — the slow per-line path, kept
    for tools and the pure-Python tokenizer fallback."""
    lines, label = _read_lines(path)
    return [(encode_fn(s), label) for s in lines]


@dataclass
class StyleCorpus:
    """All sentences of one split as fixed-shape arrays."""

    ids: np.ndarray      # (N, max_len) int32, right-padded with PAD
    lengths: np.ndarray  # (N,) int32 true lengths (<= max_len)
    labels: np.ndarray   # (N,) int32
    pad_id: int = 0
    _sentences: list | None = field(default=None, repr=False)

    @classmethod
    def from_sentences(cls, sentences: list[list[int]], labels,
                       max_len: int, pad_id: int = 0) -> "StyleCorpus":
        n = len(sentences)
        ids = np.full((n, max_len), pad_id, dtype=np.int32)
        lengths = np.zeros(n, dtype=np.int32)
        for i, s in enumerate(sentences):
            s = list(s)[:max_len]
            ids[i, : len(s)] = s
            lengths[i] = len(s)
        return cls(ids, lengths, np.asarray(labels, dtype=np.int32), pad_id)

    @classmethod
    def from_files(cls, files, tokenizer, max_len: int) -> "StyleCorpus":
        id_blocks, len_blocks, label_blocks = [], [], []
        batch_encode = getattr(tokenizer, "encode_batch", None)
        for path in files:
            lines, label = _read_lines(path)
            if batch_encode is not None:
                # C++ fast path: one call per file, fixed-shape output
                ids, lens = batch_encode(lines, max_len)
            else:
                n = len(lines)
                ids = np.zeros((n, max_len), dtype=np.int32)
                lens = np.zeros(n, dtype=np.int32)
                for i, line in enumerate(lines):
                    enc = tokenizer.encode(line)[:max_len]
                    ids[i, : len(enc)] = enc
                    lens[i] = len(enc)
            id_blocks.append(ids)
            len_blocks.append(lens)
            label_blocks.append(np.full(len(lines), label, dtype=np.int32))
        return cls(
            np.concatenate(id_blocks, axis=0),
            np.concatenate(len_blocks, axis=0),
            np.concatenate(label_blocks, axis=0),
        )

    @property
    def sentences(self) -> list[list[int]]:
        """Ragged view (materialized once, cached) — for host-side one-shot
        passes (style_weights, w2v corpus export); the batch pipeline never
        touches it."""
        if self._sentences is None:
            self._sentences = [
                self.ids[i, : self.lengths[i]].tolist() for i in range(len(self))
            ]
        return self._sentences

    def __len__(self) -> int:
        return len(self.labels)
