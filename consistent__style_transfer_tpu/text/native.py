"""ctypes bindings for the C++ text runtime (native/libtpust.so).

Provides drop-in accelerated implementations of the pure-Python classes:
- :class:`NativeBPE` — same API surface as :class:`..text.bpe.BPETokenizer`
  (encode/decode/train/save/load + batch encode into fixed-shape arrays);
- :func:`native_w2v_train` — hogwild CBOW word2vec over an int corpus,
  returning the (V, D) embedding matrix.

Falls back gracefully: :func:`available` is False when the library hasn't
been built (``make -C native``), and callers keep using the Python paths.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_LIB_PATH = os.path.join(os.path.dirname(__file__), "..", "..", "native", "libtpust.so")


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.tpust_bpe_new.restype = ctypes.c_void_p
    lib.tpust_bpe_new.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    lib.tpust_bpe_free.argtypes = [ctypes.c_void_p]
    lib.tpust_bpe_vocab_size.argtypes = [ctypes.c_void_p]
    lib.tpust_bpe_encode.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p,
        np.ctypeslib.ndpointer(np.int32), ctypes.c_int,
    ]
    lib.tpust_bpe_encode_batch.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int,
        np.ctypeslib.ndpointer(np.int32), np.ctypeslib.ndpointer(np.int32),
        ctypes.c_int,
    ]
    lib.tpust_bpe_decode.argtypes = [
        ctypes.c_void_p, np.ctypeslib.ndpointer(np.int32), ctypes.c_int,
        ctypes.c_char_p, ctypes.c_int,
    ]
    lib.tpust_bpe_train.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_char_p,
        ctypes.c_char_p, ctypes.c_int, ctypes.c_char_p, ctypes.c_int,
    ]
    lib.tpust_w2v_train.argtypes = [
        np.ctypeslib.ndpointer(np.int32), np.ctypeslib.ndpointer(np.int32),
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ctypes.c_uint64, ctypes.c_int, np.ctypeslib.ndpointer(np.int64),
        np.ctypeslib.ndpointer(np.float32),
    ]
    _LIB = lib
    return lib


def available() -> bool:
    return _load() is not None


def build(quiet: bool = True) -> bool:
    """Best-effort `make -C native`; returns availability."""
    import subprocess

    native_dir = os.path.dirname(_LIB_PATH)
    try:
        subprocess.run(["make", "-C", native_dir],
                       capture_output=quiet, check=True)
    except Exception:
        return False
    global _LIB
    _LIB = None
    return available()


class NativeBPE:
    """C++-backed CharBPE with the same vocab/merge tables as the Python
    :class:`BPETokenizer` — constructed *from* one (or from saved files via
    the Python loader)."""

    def __init__(self, vocab: dict[str, int], merges: list[tuple[str, str]]):
        lib = _load()
        assert lib is not None, "libtpust.so not built (run `make -C native`)"
        self._lib = lib
        self.vocab = dict(vocab)
        self.merges = list(merges)
        self.inv_vocab = {i: t for t, i in vocab.items()}
        tokens_blob = "\n".join(t for t, _ in sorted(vocab.items(), key=lambda kv: kv[1]))
        merges_blob = "\n".join(f"{a} {b}" for a, b in merges)
        self._h = lib.tpust_bpe_new(tokens_blob.encode(), merges_blob.encode())

    @classmethod
    def from_python(cls, tok) -> "NativeBPE":
        return cls(tok.vocab, tok.merges)

    def __del__(self):
        try:
            self._lib.tpust_bpe_free(self._h)
        except Exception:
            pass

    def __len__(self) -> int:
        return int(self._lib.tpust_bpe_vocab_size(self._h))

    def encode(self, text: str) -> list[int]:
        out = np.empty(4 * max(len(text), 1), dtype=np.int32)
        n = self._lib.tpust_bpe_encode(self._h, text.encode(), out, len(out))
        return out[:n].tolist()

    def encode_batch(self, lines: list[str], max_len: int, pad_id: int = 0):
        """Batch-encode into a fixed-shape (N, max_len) int32 array + lengths
        — the device-feed fast path."""
        blob = "\n".join(line if line.strip() else " " for line in lines)
        n = len(lines)
        ids = np.full((n, max_len), pad_id, dtype=np.int32)
        lens = np.zeros(n, dtype=np.int32)
        done = self._lib.tpust_bpe_encode_batch(
            self._h, blob.encode(), max_len, ids, lens, n)
        assert done == n, (done, n)
        return ids, lens

    def decode(self, ids, skip_special: bool = True) -> str:
        arr = np.asarray(ids, dtype=np.int32)
        buf = ctypes.create_string_buffer(16 * max(len(arr), 1) + 16)
        n = self._lib.tpust_bpe_decode(self._h, arr, len(arr), buf, len(buf))
        return buf.raw[:n].decode("utf-8", errors="replace")

    def ids_to_tokens(self, ids):
        return [self.inv_vocab.get(int(i), "<unk>") for i in ids]


def native_bpe_train(files, vocab_size: int, specials=("<pad>", "<s>", "</s>", "<unk>")):
    """Train merges in C++; returns (vocab dict, merges list)."""
    lib = _load()
    assert lib is not None
    corpus = []
    for path in files:
        with open(path, "r", encoding="utf-8") as f:
            corpus.append(f.read())
    blob = "\n".join(corpus).encode()
    out_tokens = ctypes.create_string_buffer(1 << 24)
    out_merges = ctypes.create_string_buffer(1 << 24)
    n = lib.tpust_bpe_train(blob, vocab_size, "\n".join(specials).encode(),
                            out_tokens, len(out_tokens), out_merges, len(out_merges))
    assert n > 0, "bpe train failed (buffer too small?)"
    tokens = out_tokens.value.decode().splitlines()
    vocab = {t: i for i, t in enumerate(tokens)}
    merges = [tuple(line.split(" ")) for line in out_merges.value.decode().splitlines()]
    return vocab, merges


def native_w2v_train(sentences: list[list[int]], vocab_size: int, dim: int = 100,
                     window: int = 5, negative: int = 5, epochs: int = 5,
                     lr: float = 0.025, min_lr: float = 1e-4, sample: float = 1e-3,
                     seed: int = 1, n_threads: int | None = None) -> np.ndarray:
    lib = _load()
    assert lib is not None
    flat = np.concatenate([np.asarray(s, np.int32) for s in sentences if len(s)]) \
        if any(len(s) for s in sentences) else np.zeros(0, np.int32)
    lens = np.asarray([len(s) for s in sentences if len(s)], np.int32)
    counts = np.bincount(flat, minlength=vocab_size).astype(np.int64)
    out = np.zeros((vocab_size, dim), np.float32)
    if n_threads is None:
        n_threads = min(os.cpu_count() or 1, 8)
    lib.tpust_w2v_train(flat, lens, len(lens), vocab_size, dim, window,
                        negative, epochs, lr, min_lr, sample, seed, n_threads,
                        counts, out)
    return out
