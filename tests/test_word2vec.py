import numpy as np
import pytest

from consistent__style_transfer_tpu.text.word2vec import Word2Vec


def _toy_sentences(n=400, seed=0):
    """Two token 'topics' that co-occur within, never across, sentences."""
    rng = np.random.default_rng(seed)
    a = ["apple", "banana", "cherry", "grape"]
    b = ["dog", "cat", "horse", "wolf"]
    sents = []
    for _ in range(n):
        pool = a if rng.random() < 0.5 else b
        sents.append(list(rng.choice(pool, size=6)))
    return sents


def test_w2v_learns_cooccurrence():
    w2v = Word2Vec(_toy_sentences(), dim=16, min_count=1, epochs=10, seed=3)
    w2v.init_sims()
    sim = lambda x, y: float(w2v[x] @ w2v[y])
    within = sim("apple", "banana")
    across = sim("apple", "dog")
    assert within > across


def test_wmd_identity_and_symmetry():
    w2v = Word2Vec(_toy_sentences(), dim=16, min_count=1, epochs=3, seed=3)
    w2v.init_sims()
    d_same = w2v.wmdistance(["apple", "banana"], ["apple", "banana"])
    assert d_same == pytest.approx(0.0, abs=1e-6)
    d_ab = w2v.wmdistance(["apple"], ["dog"])
    d_ba = w2v.wmdistance(["dog"], ["apple"])
    assert d_ab == pytest.approx(d_ba, rel=1e-6)
    assert d_ab > 0


def test_wmd_oov_semantics():
    w2v = Word2Vec(_toy_sentences(), dim=8, min_count=1, epochs=1, seed=3)
    w2v.init_sims()
    assert w2v.wmdistance(["zzz"], ["apple"]) == float("inf")
    assert w2v.wmdistance([], ["apple"]) == float("inf")


def test_cal_wmd_label_edge_cases():
    """Reference src/wmd.py:34-45: empty side -> max(len); inf -> mean(len)."""
    w2v = Word2Vec(_toy_sentences(), dim=8, min_count=1, epochs=1, seed=3)
    w2v.init_sims()

    class FakeTok:
        def ids_to_tokens(self, ids):
            m = {1: "apple", 2: "banana", 9: "OOVTOKEN"}
            return [m[i] for i in ids]

    labels = w2v.cal_wmd_label([[], [9, 9], [1]], [[1, 2], [9], [2]], FakeTok())
    assert labels[0] == 2.0          # empty side: max(0, 2)
    assert labels[1] == 1.5          # OOV both sides -> inf -> (2+1)/2
    assert labels[2] > 0             # real distance


def test_save_load_roundtrip(tmp_path):
    w2v = Word2Vec(_toy_sentences(n=50), dim=8, min_count=1, epochs=1, seed=3)
    path = str(tmp_path / "w2v.npz")
    w2v.save(path)
    w2 = Word2Vec.load(path)
    assert w2.vocab == w2v.vocab
    np.testing.assert_allclose(w2.vectors, w2v.vectors)


def test_sinkhorn_labeler_matches_exact():
    from consistent__style_transfer_tpu.data.wmd_labels import (
        ExactWmdLabeler,
        SinkhornWmdLabeler,
    )

    sents = _toy_sentences(n=200, seed=1)
    w2v = Word2Vec(sents, dim=16, min_count=1, epochs=5, seed=3)
    w2v.init_sims()
    vocab_list = sorted(w2v.vocab)

    class FakeTok:
        inv_vocab = {i + 4: t for i, t in enumerate(vocab_list)}
        vocab = {t: i for i, t in inv_vocab.items()}

        def ids_to_tokens(self, ids):
            return [self.inv_vocab[i] for i in ids]

        def __len__(self):
            return len(self.inv_vocab) + 4

    tok = FakeTok()
    rng = np.random.default_rng(0)
    ids = sorted(tok.inv_vocab)
    xs1 = [list(rng.choice(ids, size=rng.integers(2, 8))) for _ in range(16)]
    xs2 = [list(rng.choice(ids, size=rng.integers(2, 8))) for _ in range(16)]
    exact = np.array(ExactWmdLabeler(w2v, tok)(xs1, xs2))
    approx = SinkhornWmdLabeler(w2v, tok, max_atoms=8, epsilon=0.01, n_iters=300)(xs1, xs2)
    np.testing.assert_allclose(approx, exact, rtol=0.1, atol=0.05)
