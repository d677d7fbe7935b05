import pytest

from consistent__style_transfer_tpu.evaluate.bleu import (
    corpus_bleu,
    reference_bleu,
    self_bleu,
)


def test_perfect_match_is_100():
    sents = ["the food was great .", "service was slow ."]
    assert corpus_bleu(sents, sents) == pytest.approx(100.0)


def test_disjoint_is_0():
    assert corpus_bleu(["aa bb cc dd"], ["ee ff gg hh"]) == pytest.approx(0.0)


def test_partial_overlap_ordering():
    src = ["the food was really great today"]
    close = ["the food was really good today"]
    far = ["the meal was somewhat fine then"]
    b_close = corpus_bleu(close, src)
    b_far = corpus_bleu(far, src)
    assert 0 < b_far < b_close < 100


def test_brevity_penalty():
    src = ["a b c d e f g h"]
    short = ["a b c d"]  # perfect precision, half length
    full = ["a b c d e f g h"]
    assert corpus_bleu(short, src) < corpus_bleu(full, src)


def test_multi_reference():
    cand = ["the cat sat"]
    refs = [["the cat sat", "a cat was sitting"]]
    assert corpus_bleu(cand, refs) == pytest.approx(100.0)


def test_self_and_reference_aliases():
    t = ["x y z w"]
    assert self_bleu(t, t) == pytest.approx(100.0)
    assert reference_bleu(t, ["x y z w"]) == pytest.approx(100.0)
