import csv

import numpy as np
import pytest

from consistent__style_transfer_tpu.evaluate.human import (
    fleiss_kappa,
    ranks_to_scores,
    sample_blind_csv,
    score_ratings,
)


def test_fleiss_kappa_perfect_and_random():
    # 10 items, 3 raters, all agree on category 0 or 1 alternately
    perfect = np.array([[3, 0] if i % 2 else [0, 3] for i in range(10)])
    assert fleiss_kappa(perfect) == pytest.approx(1.0)
    # known textbook value: moderate agreement example
    ratings = np.array([
        [0, 0, 0, 0, 14],
        [0, 2, 6, 4, 2],
        [0, 0, 3, 5, 6],
        [0, 3, 9, 2, 0],
        [2, 2, 8, 1, 1],
        [7, 7, 0, 0, 0],
        [3, 2, 6, 3, 0],
        [2, 5, 3, 2, 2],
        [6, 5, 2, 1, 0],
        [0, 2, 2, 3, 7],
    ])
    assert fleiss_kappa(ratings) == pytest.approx(0.2099, abs=1e-3)


def test_rank_scoring():
    ranks = np.array([[1, 2, 3], [2, 1, 3], [1, 3, 2]])
    scores = score_ratings(ranks, ["a", "b", "c"])
    assert scores["a"] > scores["b"] > scores["c"]
    np.testing.assert_allclose(ranks_to_scores(np.array([1, 2, 4])), [1, 0.5, 0.25])


def test_correlate_with_human():
    from consistent__style_transfer_tpu.evaluate.human import correlate_with_human

    rng = np.random.default_rng(0)
    human = rng.normal(size=40)
    aligned = human * 2 + rng.normal(size=40) * 0.1
    inverted = -human + rng.normal(size=40) * 0.1
    out = correlate_with_human({"good": aligned, "bad": inverted}, human)
    assert out["good"]["r"] > 0.9
    assert out["bad"]["r"] < -0.9
    assert out["good"]["p"] < 0.05
    assert out["good"]["error_bound"] > 0


def test_sample_blind_csv(tiny_corpus, tmp_path):
    out_dirs = {}
    for system in ("sysA", "sysB"):
        d = tmp_path / system
        d.mkdir()
        for label in (0, 1):
            src = open(f"{tiny_corpus}/style.test.{label}").read()
            (d / f"style.test.{label}.tsf").write_text(src)
        out_dirs[system] = str(d)
    out_csv = str(tmp_path / "blind.csv")
    sample_blind_csv(tiny_corpus, out_dirs, {"terrible", "amazing"}, out_csv,
                     n_per_style=2, seed=0)
    rows = list(csv.DictReader(open(out_csv)))
    assert len(rows) == 4  # 2 per style
    assert {"style", "index", "original", "sysA", "sysA_masked", "sysB",
            "sysB_masked"} <= set(rows[0].keys())
