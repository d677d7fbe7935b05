"""Reformat style corpora into `<label> <text>` train/dev files for external
classifier tools (reference ``src/scripts/split.py:20-40``).

Usage: python tools/split_label_text.py <dataset> [--data_dir data] [--out_dir data]
Writes <out_dir>/<dataset>/<dataset>.{train,dev} with one "<label>\\t<text>" per line.
"""

from __future__ import annotations

import argparse
import os


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("dataset")
    ap.add_argument("--data_dir", default="data")
    ap.add_argument("--out_dir", default="data")
    args = ap.parse_args()
    src = os.path.join(args.data_dir, args.dataset)
    dst = os.path.join(args.out_dir, args.dataset)
    os.makedirs(dst, exist_ok=True)
    for split in ("train", "dev"):
        out_path = os.path.join(dst, f"{args.dataset}.{split}")
        with open(out_path, "w", encoding="utf-8") as out:
            for label in (0, 1):
                path = os.path.join(src, f"style.{split}.{label}")
                if not os.path.exists(path):
                    continue
                with open(path, "r", encoding="utf-8") as f:
                    for line in f:
                        line = line.strip()
                        if line:
                            out.write(f"{label}\t{line}\n")
        print(out_path)


if __name__ == "__main__":
    main()
