"""Synthesize missing train corpora.

The reference mount omits ``data/{yelp,book}/style.train.{0,1}``
(``/root/reference/.MISSING_LARGE_BLOBS``); the public Yelp/Shen-et-al splits
cannot be fetched in this environment (zero egress). This tool builds
stand-in train files from the committed dev corpora so the full pipeline is
runnable end-to-end: each dev sentence is emitted several times with light
token-level noise (drop/duplicate/swap of single tokens), which preserves the
style signal while varying surface forms. When the real train files are
placed under ``data/<ds>/``, nothing here is needed.

Usage: python tools/make_synthetic_train.py <dataset> [--src /root/reference/data]
       [--dst data] [--mult 8] [--seed 0]
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def noisify(tokens: list[str], rng: np.random.Generator,
            n_ops: int = 1) -> list[str]:
    toks = list(tokens)
    for _ in range(n_ops):
        op = rng.integers(0, 4)
        if len(toks) < 3:
            return toks
        i = int(rng.integers(0, len(toks) - 1))
        if op == 0:  # drop one token
            del toks[i]
        elif op == 1:  # duplicate one token
            toks.insert(i, toks[i])
        elif op == 2:  # swap two adjacent tokens
            toks[i], toks[i + 1] = toks[i + 1], toks[i]
        # op == 3: keep as-is
    return toks


def splice(a: list[str], b: list[str], rng: np.random.Generator) -> list[str]:
    """Recombination: prefix of one same-style sentence + suffix of another.
    Raises the corpus' content entropy far above per-sentence noise — novel
    token sequences the DAE cannot memorize, so reconstruction training has
    to learn actual copying (the content-preservation prior the reference
    gets for free from ~270k real sentences per style)."""
    if len(a) < 4 or len(b) < 4:
        return a
    ca = int(rng.integers(2, len(a) - 1))
    cb = int(rng.integers(1, len(b) - 2))
    out = a[:ca] + b[cb:]
    return out[:30]  # stay inside dataset max_len territory


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("dataset")
    ap.add_argument("--src", default="/root/reference/data")
    ap.add_argument("--dst", default="data")
    ap.add_argument("--mult", type=int, default=8)
    ap.add_argument("--recombine", type=float, default=0.0,
                    help="fraction of generated copies built by splicing two "
                         "same-style sentences (novel content) instead of "
                         "noising one")
    ap.add_argument("--noise_ops", type=int, default=1,
                    help="noise ops applied per generated copy")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    rng = np.random.default_rng(args.seed)

    src_dir = os.path.join(args.src, args.dataset)
    dst_dir = os.path.join(args.dst, args.dataset)
    os.makedirs(dst_dir, exist_ok=True)

    # copy dev/test (+ human references) verbatim so the tree is self-contained
    for name in sorted(os.listdir(src_dir)):
        with open(os.path.join(src_dir, name), "r", encoding="utf-8") as f:
            content = f.read()
        with open(os.path.join(dst_dir, name), "w", encoding="utf-8") as f:
            f.write(content)

    for label in (0, 1):
        dev_path = os.path.join(src_dir, f"style.dev.{label}")
        with open(dev_path, "r", encoding="utf-8") as f:
            dev = [line.strip() for line in f if line.strip()]
        out = []
        for line in dev:
            out.append(line)  # keep the original once
            toks = line.split()
            for _ in range(args.mult - 1):
                if rng.random() < args.recombine:
                    other = dev[int(rng.integers(0, len(dev)))].split()
                    base = splice(toks, other, rng)
                else:
                    base = toks
                out.append(" ".join(noisify(base, rng, args.noise_ops)))
        order = rng.permutation(len(out))
        train_path = os.path.join(dst_dir, f"style.train.{label}")
        with open(train_path, "w", encoding="utf-8") as f:
            for i in order:
                f.write(out[i] + "\n")
        print(f"{train_path}: {len(out)} lines (synthetic, from {dev_path})")


if __name__ == "__main__":
    main()
