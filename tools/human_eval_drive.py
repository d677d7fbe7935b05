"""Drive the human-evaluation tooling end-to-end on REAL run outputs
(VERDICT r4 item 6).

The tooling itself (evaluate/human.py — blind-CSV sampling, interleaved
ingestion with reverse-scale correction, 1/rank scores, Fleiss' kappa) is
unit-tested, but had never consumed a real run's transfers. This driver:

1. samples blind CSVs from N systems' ``style.test.{0,1}.tsf`` outputs
   (reference ``evaluate/user/sample_test.py:36-101``),
2. fills them in as three rubric-based simulated raters — each rater ranks
   the systems per item per metric from simple observable signals (target-
   lexicon hits for STI, masked content overlap for CP, a repetition/length
   fluency proxy for NT) plus rater-specific noise; rater 2 uses the
   REVERSED scale, exercising the ``reverse=True`` ingestion path
   (reference ``calculate.py:5-20`` corrects one such rater),
3. scores mean 1/rank per (system, metric) averaged over raters and the
   inter-rater Fleiss' kappa (reference ``calculate.py:23-86``),
4. writes everything (blind CSV, three rated CSVs, report JSON) under
   ``--out``.

The ratings are simulated — the environment has no human raters — but every
byte flows through the production sampling/ingestion/scoring code on real
transfer outputs, which is the integration the unit tests could not cover.

Usage:
    python tools/human_eval_drive.py \
        --data workdir/bookwalk/data/book \
        --system default=workdir/bookwalk/output/book-bw10 \
        --system mid=workdir/bookwalk/output/book-bw0075 \
        --system low=workdir/bookwalk/output/book-bw005 \
        --lexicon workdir/bookwalk/dump/book/style_lexicon/lexicon.json \
        --out artifacts/round5/human_eval
"""

from __future__ import annotations

import argparse
import csv
import json
import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from consistent__style_transfer_tpu.evaluate.content import mask_style_words  # noqa: E402
from consistent__style_transfer_tpu.evaluate.human import (  # noqa: E402
    kappa_from_rater_files,
    sample_blind_csv,
    score_rater_files,
)

METRICS = ("STI", "CP", "NT")


def _signals(original: str, transfer: str, lexicon: set[str],
             source_style_words: set[str]) -> dict[str, float]:
    """Observable per-pair quality signals a rater's rubric would look at.
    Higher = better for every signal."""
    o_toks = original.split()
    t_toks = transfer.split()
    # STI: how thoroughly the source style was removed (fewer source-style
    # lexicon words surviving = stronger transfer)
    survived = sum(1 for w in t_toks if w in source_style_words)
    sti = -float(survived)
    # CP: masked-content token overlap (style-word-blind Jaccard)
    o_m = [w for w in mask_style_words([original], lexicon)[0].split() if w != "MASK"]
    t_m = [w for w in mask_style_words([transfer], lexicon)[0].split() if w != "MASK"]
    inter = len(set(o_m) & set(t_m))
    union = max(len(set(o_m) | set(t_m)), 1)
    cp = inter / union
    # NT: fluency proxy — penalize token repetition and length blow-up
    uniq = len(set(t_toks)) / max(len(t_toks), 1)
    len_ratio = min(len(t_toks), len(o_toks)) / max(len(t_toks), len(o_toks), 1)
    nt = uniq * len_ratio
    return {"STI": sti, "CP": cp, "NT": nt}


def _rank(values: list[float], noise: np.ndarray) -> list[int]:
    """1-based ranks, best (highest value) = rank 1; noise breaks ties and
    models rater disagreement."""
    noisy = np.asarray(values) + noise
    order = np.argsort(-noisy)  # descending
    ranks = np.empty(len(values), dtype=int)
    ranks[order] = np.arange(1, len(values) + 1)
    return ranks.tolist()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True,
                    help="dir with style.test.{0,1} originals")
    ap.add_argument("--system", action="append", required=True,
                    help="name=output_dir with style.test.{0,1}.tsf "
                    "(repeat; >=2)")
    ap.add_argument("--lexicon", required=True,
                    help="style lexicon json (evaluate/lexicon.py output)")
    ap.add_argument("--out", default="artifacts/round5/human_eval")
    ap.add_argument("--n-per-style", type=int, default=50)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    systems = dict(s.split("=", 1) for s in args.system)
    names = list(systems)
    n_sys = len(names)
    assert n_sys >= 2
    os.makedirs(args.out, exist_ok=True)

    # lexicon.py payload: {STYLE_KEY: [[word, lr_weight], ...]} — the LR
    # weight's sign is the style direction (negative -> label 0)
    with open(args.lexicon) as f:
        pairs = next(iter(json.load(f).values()))
    lexicon = {w for w, _ in pairs}
    per_style = {0: {w for w, wt in pairs if wt < 0},
                 1: {w for w, wt in pairs if wt >= 0}}

    blind_csv = os.path.join(args.out, "blind.csv")
    sample_blind_csv(args.data, systems, lexicon, blind_csv,
                     n_per_style=args.n_per_style, seed=args.seed)

    # three simulated raters: per item, rank the systems per metric from the
    # rubric signals + rater noise; rater index 1 writes the REVERSED scale
    rater_files: list[tuple[str, bool]] = []
    with open(blind_csv, newline="", encoding="utf-8") as f:
        items = list(csv.DictReader(f))
    for r in range(3):
        rng = np.random.default_rng(1000 + r)
        reversed_scale = r == 1
        path = os.path.join(args.out, f"rater_{r}.csv")
        with open(path, "w", newline="", encoding="utf-8") as f:
            w = csv.DictWriter(f, fieldnames=["item", "system", *METRICS])
            w.writeheader()
            for i, row in enumerate(items):
                src = per_style[int(row["style"])]
                sig = {s: _signals(row["original"], row[s], lexicon, src)
                       for s in names}
                ranks_per_metric = {
                    m: _rank([sig[s][m] for s in names],
                             rng.normal(0, 0.12, n_sys))
                    for m in METRICS
                }
                # interleaved contract: row j rates system j % n_systems
                for j, s in enumerate(names):
                    out_ranks = {
                        m: (n_sys + 1 - ranks_per_metric[m][j]
                            if reversed_scale else ranks_per_metric[m][j])
                        for m in METRICS
                    }
                    w.writerow({"item": i, "system": f"sys{j}", **out_ranks})
        rater_files.append((path, reversed_scale))

    scores = score_rater_files(rater_files, n_systems=n_sys, metrics=METRICS)
    kappa = kappa_from_rater_files(rater_files, n_systems=n_sys, metrics=METRICS)
    report = {
        "systems": names,
        "n_items": len(items),
        "metrics": list(METRICS),
        "mean_inv_rank": {s: {m: round(float(scores[j, k]), 4)
                              for k, m in enumerate(METRICS)}
                          for j, s in enumerate(names)},
        "fleiss_kappa": round(float(kappa), 4),
        "raters": [{"file": os.path.basename(p), "reversed_scale": rev}
                   for p, rev in rater_files],
        "note": "ratings simulated via rubric (no human raters in this "
                "environment); sampling/ingestion/scoring are the "
                "production evaluate/human.py paths on real run outputs",
    }
    with open(os.path.join(args.out, "report.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
