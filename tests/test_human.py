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


def _write_rated_csv(path, ranks, reverse=False, n_systems=3):
    """ranks: (n_systems, n_items, 3) 1-based; rows interleave systems
    cyclically like the reference's rated result CSVs."""
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["id", "origin", "transfer",
                                          "STI", "CP", "NT"])
        w.writeheader()
        n_items = len(ranks[0])
        for i in range(n_items):
            for s in range(n_systems):
                sti, cp, nt = ranks[s][i]
                if reverse:  # this rater used the reversed scale
                    sti, cp, nt = (n_systems + 1 - sti, n_systems + 1 - cp,
                                   n_systems + 1 - nt)
                w.writerow({"id": i + 1 if s == 0 else "", "origin": "",
                            "transfer": f"sys{s} output",
                            "STI": sti, "CP": cp, "NT": nt})


def test_rated_csv_round_trip(tmp_path):
    """sample -> rate (synthetic) -> ingest -> scores + kappa reproduce
    hand-computed values (reference contract: calculate.py:5-20,66-86)."""
    from consistent__style_transfer_tpu.evaluate.human import (
        ingest_rated_csv,
        kappa_from_rater_files,
        score_rater_files,
    )

    # 3 systems x 2 items; rater A and rater B agree exactly, rater C
    # swaps systems 0/1 on item 1
    base = np.array([
        [[1, 2, 1], [1, 1, 2]],   # system 0
        [[2, 1, 3], [2, 3, 1]],   # system 1
        [[3, 3, 2], [3, 2, 3]],   # system 2
    ])
    rater_c = base.copy()
    rater_c[[0, 1], 1] = base[[1, 0], 1]
    files = []
    for name, ranks, rev in (("a", base, False), ("b", base, True),
                             ("c", rater_c, False)):
        p = str(tmp_path / f"rated_{name}.csv")
        _write_rated_csv(p, ranks, reverse=rev)
        files.append((p, rev))

    # reverse-scale ingestion undoes the 4-x flip exactly
    np.testing.assert_array_equal(ingest_rated_csv(files[1][0], reverse=True),
                                  base)

    scores = score_rater_files(files)
    expect = np.mean([1.0 / base, 1.0 / base, 1.0 / rater_c], axis=0).mean(axis=1)
    np.testing.assert_allclose(scores, expect)
    # system 0 ranked best on STI by majority; system 2 worst everywhere
    assert scores[0, 0] > scores[1, 0] > scores[2, 0]
    assert (scores[2] <= scores[:2].min(axis=0)).all()

    # hand-computed Fleiss' kappa over the 18 flattened subjects:
    # 12 unanimous (counts [3,0,0]-style), 6 with a 2/1 split
    kappa = kappa_from_rater_files(files)
    flat = [base.ravel(), base.ravel(), rater_c.ravel()]
    counts = np.zeros((18, 3), dtype=int)
    for f in flat:
        counts[np.arange(18), f - 1] += 1
    pa = ((counts**2).sum(axis=1) - 3) / 6.0
    p_cat = counts.sum(axis=0) / (18 * 3)
    expected = (pa.mean() - (p_cat**2).sum()) / (1 - (p_cat**2).sum())
    assert kappa == pytest.approx(expected)
    assert 0 < kappa < 1  # strong but not perfect agreement


def test_rated_csv_bad_row_count(tmp_path):
    from consistent__style_transfer_tpu.evaluate.human import ingest_rated_csv

    p = str(tmp_path / "bad.csv")
    with open(p, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["STI", "CP", "NT"])
        w.writeheader()
        for _ in range(4):  # not a multiple of 3
            w.writerow({"STI": 1, "CP": 2, "NT": 3})
    with pytest.raises(ValueError, match="multiple of n_systems"):
        ingest_rated_csv(p)


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
