"""Human-evaluation tooling (reference ``evaluate/user/``):

- :func:`sample_blind_csv` — sample N pairs per style per dataset across
  systems, write blind-rating CSVs with style-masked variants
  (``sample_test.py:36-101``);
- :func:`score_ratings` — read rated CSVs (R raters x S systems interleaved),
  convert ranks to 1/rank scores (``calculate.py:5-20,66-79``);
- :func:`fleiss_kappa` — inter-rater agreement (``calculate.py:23-63``).
"""

from __future__ import annotations

import csv
import os

import numpy as np

from ..utils.io import read_lines
from .content import mask_style_words


def sample_blind_csv(
    data_dir: str,
    output_dirs: dict[str, str],
    lexicon: set[str],
    out_csv: str,
    n_per_style: int = 50,
    seed: int = 0,
) -> None:
    """For each style file, sample sentence indices and emit one CSV row per
    sample: original, then each system's transfer (column order shuffled per
    row is *not* done in the reference — systems are in fixed dict order),
    plus masked variants for content-only judging."""
    rng = np.random.default_rng(seed)
    rows = []
    systems = list(output_dirs)
    for label in (0, 1):
        originals = read_lines(f"{data_dir}/style.test.{label}")
        transfers = {
            s: read_lines(f"{d}/style.test.{label}.tsf") for s, d in output_dirs.items()
        }
        idx = rng.choice(len(originals), size=min(n_per_style, len(originals)),
                         replace=False)
        for i in idx:
            row = {"style": label, "index": int(i), "original": originals[i]}
            for s in systems:
                row[s] = transfers[s][i]
                row[f"{s}_masked"] = mask_style_words([transfers[s][i]], lexicon)[0]
            rows.append(row)
    os.makedirs(os.path.dirname(out_csv) or ".", exist_ok=True)
    with open(out_csv, "w", newline="", encoding="utf-8") as f:
        writer = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        writer.writeheader()
        writer.writerows(rows)


def ranks_to_scores(ranks: np.ndarray) -> np.ndarray:
    """rank r (1-based) -> score 1/r (reference ``calculate.py:66-79``)."""
    return 1.0 / np.asarray(ranks, dtype=np.float64)


def score_ratings(rank_matrix: np.ndarray, systems: list[str]) -> dict[str, float]:
    """rank_matrix: (n_items, n_systems) ranks per item; returns mean 1/rank
    score per system."""
    scores = ranks_to_scores(rank_matrix)
    return {s: float(scores[:, j].mean()) for j, s in enumerate(systems)}


def correlate_with_human(metric_scores: dict[str, np.ndarray],
                         human_scores: np.ndarray) -> dict[str, dict]:
    """Pearson correlation of each automatic metric against human judgments,
    with the 1.96-sigma margin of error on r (reference
    ``evaluate/auto/utils.py:82-98``). Returns {metric: {r, p, error_bound}}."""
    from scipy.stats import linregress

    n = len(human_scores)
    out: dict[str, dict] = {}
    for name, scores in metric_scores.items():
        res = linregress(np.asarray(scores, float), np.asarray(human_scores, float))
        r = float(res.rvalue)
        std_err_r = (1 - r**2) / np.sqrt(n)
        out[name] = {
            "r": r,
            "p": float(res.pvalue),
            "error_bound": float(1.96 * std_err_r),
        }
    return out


def fleiss_kappa(ratings: np.ndarray) -> float:
    """Fleiss' kappa for (n_items, n_categories) count matrix where each row
    sums to the number of raters."""
    ratings = np.asarray(ratings, dtype=np.float64)
    n_items, _ = ratings.shape
    n_raters = ratings[0].sum()
    p_cat = ratings.sum(axis=0) / (n_items * n_raters)
    p_item = ((ratings**2).sum(axis=1) - n_raters) / (n_raters * (n_raters - 1))
    p_bar = p_item.mean()
    p_e = (p_cat**2).sum()
    if p_e == 1.0:
        return 1.0
    return float((p_bar - p_e) / (1 - p_e))
