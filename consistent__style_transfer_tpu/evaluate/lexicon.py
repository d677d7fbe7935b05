"""Style lexicon: L1 logistic regression over binary unigram counts; the
lexicon is every feature whose weight is more than 2 standard deviations from
the mean of the nonzero weights (reference ``evaluate/auto/style_lexicon.py``:
vectorizer ``:14-17``, LR l1/C=3 ``:81-86``, selection ``:37-43``, JSON layout
under the key "binary sentiment" ``:91-95``)."""

from __future__ import annotations

import json
import os
import pickle

import numpy as np
from sklearn.feature_extraction.text import CountVectorizer
from sklearn.linear_model import LogisticRegression

from .retokenize import tokenize

STYLE_KEY = "binary sentiment"
TRAIN_CAP = 200_000  # load_train_set cap, evaluate/auto/utils.py:35-45


def load_train_set(neg_path: str, pos_path: str, limit: int = TRAIN_CAP, seed: int = 0):
    def load(path):
        with open(path, "r", encoding="utf-8") as f:
            return [line.strip() for line in f]

    rng = np.random.default_rng(seed)
    neg, pos = load(neg_path), load(pos_path)
    rng.shuffle(neg)
    rng.shuffle(pos)
    neg, pos = neg[:limit], pos[:limit]
    x = neg + pos
    y = np.concatenate([np.zeros(len(neg)), np.ones(len(pos))])
    return x, y


def l1_logistic_regression(C: float = 3):
    """L1 LR across sklearn versions (>=1.8 deprecated penalty= in favor of
    l1_ratio=)."""
    try:
        lr = LogisticRegression(C=C, solver="liblinear", l1_ratio=1)
        # some versions accept but ignore l1_ratio for liblinear; verify
        if getattr(lr, "l1_ratio", None) != 1:
            raise TypeError
        return lr
    except TypeError:
        return LogisticRegression(penalty="l1", C=C, solver="liblinear")


def fit_unigram_lr(x, y, vectorizer=None):
    if vectorizer is None:
        vectorizer = CountVectorizer(binary=True, tokenizer=tokenize)
        vectorizer.fit(x)
    lr = l1_logistic_regression(C=3)
    lr.fit(vectorizer.transform(x), y)
    return lr, vectorizer


def select_lexicon_features(weights: np.ndarray, n_std: float = 2.0) -> np.ndarray:
    std, mean = np.std(weights), np.mean(weights)
    lo, hi = mean - n_std * std, mean + n_std * std
    return np.where((weights < lo) | (weights > hi))[0]


def generate_lexicon(neg_path: str, pos_path: str, lexicon_path: str,
                     vectorizer_path: str, seed: int = 0):
    """Returns (lexicon set, fitted vectorizer); writes both artifacts."""
    x, y = load_train_set(neg_path, pos_path, seed=seed)
    lr, vectorizer = fit_unigram_lr(x, y)
    inv_vocab = {i: w for w, i in vectorizer.vocabulary_.items()}

    weights = lr.coef_[0]
    nonzero = np.where(np.abs(weights) > 0.0)[0]
    nz_weights = weights[nonzero]
    selected = select_lexicon_features(nz_weights)
    ranked = sorted(
        ((inv_vocab[nonzero[i]], float(nz_weights[i])) for i in selected),
        key=lambda kv: kv[1],
    )
    payload = {STYLE_KEY: [[w, wt] for w, wt in ranked]}
    os.makedirs(os.path.dirname(lexicon_path) or ".", exist_ok=True)
    with open(lexicon_path, "w", encoding="utf-8") as f:
        json.dump(payload, f)
    save_model(vectorizer, vectorizer_path)
    return {w for w, _ in ranked}, vectorizer


def load_lexicon(path: str) -> set[str]:
    with open(path, "r", encoding="utf-8") as f:
        data = json.load(f)
    return {entry[0] for entry in data[STYLE_KEY]}


def save_model(model, path: str) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(model, f)


def load_model(path: str):
    with open(path, "rb") as f:
        return pickle.load(f)
