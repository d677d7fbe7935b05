"""C++ text runtime vs the pure-Python reference implementations. Skipped
when native/libtpust.so hasn't been built (`make -C native`)."""

import numpy as np
import pytest

from consistent__style_transfer_tpu.text import native as nat
from consistent__style_transfer_tpu.text.bpe import BPETokenizer

pytestmark = pytest.mark.skipif(
    not (nat.available() or nat.build()), reason="libtpust.so not built"
)


@pytest.fixture(scope="module")
def py_tok(tmp_path_factory):
    d = tmp_path_factory.mktemp("corpus")
    lines = [
        "the food was terrible and cold .",
        "service was slow and rude , really !",
        "i ca n't believe how great this place is .",
        "best pizza i have ever had in my life .",
    ] * 5
    f = d / "train.0"
    f.write_text("\n".join(lines) + "\n")
    return BPETokenizer.train([str(f)], vocab_size=200), lines


def test_native_encode_matches_python(py_tok):
    tok, lines = py_tok
    ntok = nat.NativeBPE.from_python(tok)
    assert len(ntok) == len(tok)
    for line in lines + ["unseen zebra words !", ""]:
        assert ntok.encode(line) == tok.encode(line), line


def test_native_decode_matches_python(py_tok):
    tok, lines = py_tok
    ntok = nat.NativeBPE.from_python(tok)
    for line in lines:
        ids = tok.encode(line)
        assert ntok.decode(ids) == tok.decode(ids)


def test_native_batch_encode(py_tok):
    tok, lines = py_tok
    ntok = nat.NativeBPE.from_python(tok)
    max_len = 12
    ids, lens = ntok.encode_batch(lines, max_len=max_len)
    assert ids.shape == (len(lines), max_len)
    for i, line in enumerate(lines):
        ref = tok.encode(line)[:max_len]
        assert ids[i, : len(ref)].tolist() == ref
        assert lens[i] == len(ref)
        assert (ids[i, len(ref):] == 0).all()


def test_native_bpe_train_roundtrip(tmp_path):
    lines = ["low lower lowest", "new newer newest", "wide wider widest"] * 10
    f = tmp_path / "c.txt"
    f.write_text("\n".join(lines) + "\n")
    vocab, merges = nat.native_bpe_train([str(f)], vocab_size=80)
    assert vocab["<pad>"] == 0 and vocab["<s>"] == 1 and vocab["</s>"] == 2
    ntok = nat.NativeBPE(vocab, merges)
    ids = ntok.encode("low newer widest")
    assert ids and ntok.decode(ids) == "low newer widest"
    # python tokenizer can consume the same tables
    ptok = BPETokenizer(vocab, merges)
    assert ptok.encode("low newer widest") == ids


def test_native_train_matches_python_train(tmp_path):
    """C++ and Python BPE *training* learn identical vocab + merges (same
    frequency counting and tie-breaking)."""
    lines = [
        "the food was terrible and cold .",
        "the food was amazing and warm !",
        "service was slow , service was rude",
    ] * 7
    f = tmp_path / "c.txt"
    f.write_text("\n".join(lines) + "\n")
    py = BPETokenizer.train([str(f)], vocab_size=120)
    vocab, merges = nat.native_bpe_train([str(f)], vocab_size=120)
    assert vocab == py.vocab
    assert merges == py.merges


def test_native_w2v_learns():
    rng = np.random.default_rng(0)
    # two topic clusters over ids {0..3} and {4..7}
    sents = []
    for _ in range(600):
        base = 0 if rng.random() < 0.5 else 4
        sents.append(list(base + rng.integers(0, 4, size=8)))
    vecs = nat.native_w2v_train(sents, vocab_size=8, dim=16, epochs=10,
                                n_threads=2, seed=3)
    v = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    within = v[0] @ v[1]
    across = v[0] @ v[5]
    assert within > across
