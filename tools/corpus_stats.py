"""Corpus statistics (reference ``src/scripts/statistics.py``): sentence
counts, whitespace-vocab size, mean length per style file of a dataset.

Usage: python tools/corpus_stats.py <dataset> [--data_dir data]
"""

from __future__ import annotations

import argparse
import os


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("dataset")
    ap.add_argument("--data_dir", default="data")
    args = ap.parse_args()
    d = os.path.join(args.data_dir, args.dataset)
    vocab: set[str] = set()
    for name in sorted(os.listdir(d)):
        path = os.path.join(d, name)
        if not os.path.isfile(path):
            continue
        n, total_toks = 0, 0
        with open(path, "r", encoding="utf-8") as f:
            for line in f:
                toks = line.split()
                if not toks:
                    continue
                n += 1
                total_toks += len(toks)
                vocab.update(toks)
        if n:
            print(f"{name}: {n} sentences, mean len {total_toks / n:.2f}")
    print(f"whitespace vocab size (all files): {len(vocab)}")


if __name__ == "__main__":
    main()
