import json
import os

from consistent__style_transfer_tpu import BOS_ID, EOS_ID, PAD_ID, UNK_ID
from consistent__style_transfer_tpu.text.bpe import BPETokenizer, pre_tokenize


def test_pre_tokenize_splits_punct():
    assert pre_tokenize("ca n't believe it , wow !") == [
        "ca", "n", "'", "t", "believe", "it", ",", "wow", "!",
    ]


def test_special_ids_fixed(tiny_corpus):
    tok = BPETokenizer.train(
        [f"{tiny_corpus}/style.train.0", f"{tiny_corpus}/style.train.1"], vocab_size=200
    )
    assert tok.vocab["<pad>"] == PAD_ID
    assert tok.vocab["<s>"] == BOS_ID
    assert tok.vocab["</s>"] == EOS_ID
    assert tok.vocab["<unk>"] == UNK_ID


def test_roundtrip_and_save_load(tiny_corpus, tmp_path):
    files = [f"{tiny_corpus}/style.train.0", f"{tiny_corpus}/style.train.1"]
    tok = BPETokenizer.train(files, vocab_size=300)
    text = "the food was terrible and cold ."
    ids = tok.encode(text)
    assert ids, "non-empty encoding"
    assert tok.decode(ids) == text

    tok.save(str(tmp_path), "tiny")
    tok2 = BPETokenizer.load(
        os.path.join(tmp_path, "tiny-vocab.json"), os.path.join(tmp_path, "tiny-merges.txt")
    )
    assert tok2.encode(text) == ids
    assert tok2.decode(ids) == text
    # on-disk format sanity: vocab is a flat {token: id} json, merges are "a b" lines
    vocab = json.loads((tmp_path / "tiny-vocab.json").read_text())
    assert vocab["<pad>"] == 0
    lines = (tmp_path / "tiny-merges.txt").read_text().splitlines()
    assert lines[0].startswith("#")
    assert all(len(l.split(" ")) == 2 for l in lines[1:])


def test_unknown_chars_map_to_unk(tiny_corpus):
    files = [f"{tiny_corpus}/style.train.0", f"{tiny_corpus}/style.train.1"]
    tok = BPETokenizer.train(files, vocab_size=300)
    ids = tok.encode("zzzqqq é")
    assert all(i == UNK_ID or i < len(tok) for i in ids)
    assert UNK_ID in tok.encode("é")


def test_merges_reduce_tokens(tiny_corpus):
    files = [f"{tiny_corpus}/style.train.0", f"{tiny_corpus}/style.train.1"]
    small = BPETokenizer.train(files, vocab_size=60)
    big = BPETokenizer.train(files, vocab_size=400)
    text = "the food was amazing ."
    assert len(big.encode(text)) <= len(small.encode(text))
    # high-frequency word becomes a single token with a big vocab
    assert len(big._bpe_word("the")) == 1
