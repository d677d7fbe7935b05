"""Build the controlled parity corpus: a fixed, seeded subsample of an
existing dataset dir so the JAX framework and the torch mirror
(benchmarks/torch_mirror.py) train and evaluate on IDENTICAL data.

Usage:
  python tools/make_parity_data.py --src data/yelp \
      --dst workdir/parity/data/yelp_small \
      --train 2000 --dev 500 --test 500
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def sample_file(src: str, dst: str, n: int | None, seed: int) -> int:
    with open(src, encoding="utf-8") as f:
        lines = [ln.rstrip("\n") for ln in f if ln.strip()]
    if n is not None and n < len(lines):
        rng = np.random.default_rng(seed)
        idx = np.sort(rng.choice(len(lines), size=n, replace=False))
        lines = [lines[i] for i in idx]
    with open(dst, "w", encoding="utf-8") as f:
        f.write("\n".join(lines) + "\n")
    return len(lines)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="data/yelp")
    ap.add_argument("--dst", required=True)
    ap.add_argument("--train", type=int, default=2000)
    ap.add_argument("--dev", type=int, default=500)
    ap.add_argument("--test", type=int, default=None,
                    help="default: keep full test split")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    os.makedirs(args.dst, exist_ok=True)
    caps = {"train": args.train, "dev": args.dev, "test": args.test}
    for split, cap in caps.items():
        for style in (0, 1):
            src = os.path.join(args.src, f"style.{split}.{style}")
            dst = os.path.join(args.dst, f"style.{split}.{style}")
            n = sample_file(src, dst, cap, args.seed + style)
            print(f"{dst}: {n} lines")
    # human references ride along when present (used for ref-BLEU)
    for style in (0, 1):
        ref = os.path.join(args.src, f"reference.{style}")
        if os.path.exists(ref):
            sample_file(ref, os.path.join(args.dst, f"reference.{style}"),
                        None, 0)


if __name__ == "__main__":
    main()
