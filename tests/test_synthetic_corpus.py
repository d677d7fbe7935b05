"""Tests for the synthetic train-corpus generator
(tools/make_synthetic_train.py) — the stand-in for the reference's missing
``style.train.{0,1}`` files and the recombination lever measured in
RESULTS.md."""

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo")

from tools.make_synthetic_train import noisify, splice


def test_noisify_single_op_bounds():
    rng = np.random.default_rng(0)
    toks = "the food was really good today .".split()
    for _ in range(50):
        out = noisify(toks, rng)
        # one op changes length by at most 1
        assert abs(len(out) - len(toks)) <= 1
        # multiset changes by at most one insert/delete
        assert len(set(out) - set(toks)) == 0


def test_noisify_multi_op():
    rng = np.random.default_rng(1)
    toks = list("abcdefghij")
    deltas = [abs(len(noisify(toks, rng, n_ops=3)) - len(toks))
              for _ in range(100)]
    assert max(deltas) <= 3
    assert max(deltas) >= 2  # multiple ops do compound


def test_splice_novel_content_and_bounds():
    rng = np.random.default_rng(2)
    a = "the service was quick and friendly .".split()
    b = "i will never come back to this place .".split()
    novel = 0
    for _ in range(50):
        out = splice(a, b, rng)
        assert len(out) <= 30
        assert out[0] == a[0]          # prefix comes from a
        if out != a:
            assert any(t in b for t in out)  # suffix tokens from b
            novel += 1
    assert novel > 30  # splicing produces novel sequences most of the time


def test_splice_short_inputs_passthrough():
    rng = np.random.default_rng(3)
    assert splice(["a", "b"], ["c", "d", "e", "f"], rng) == ["a", "b"]
