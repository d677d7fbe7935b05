"""Convert external baseline-system outputs (e.g. DRG's `src<TAB>tsf` format)
into this framework's ``output/<ds>-<ver>/style.<split>.{0,1}.tsf`` layout so
they can be evaluated with the same harness (reference
``src/scripts/bt_format.py:8-40``).

Usage:
  python tools/bt_format.py <dataset> <ver> --neg FILE --pos FILE
      [--split test] [--out_dir output] [--column 1] [--sep TAB]

Each input FILE has one transferred sentence per line (optionally in a
multi-column format; --column selects the transfer column).
"""

from __future__ import annotations

import argparse
import os


def extract(path: str, column: int, sep: str) -> list[str]:
    out = []
    with open(path, "r", encoding="utf-8") as f:
        for line in f:
            parts = line.rstrip("\n").split(sep)
            out.append(parts[column] if column < len(parts) else parts[-1])
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("dataset")
    ap.add_argument("ver")
    ap.add_argument("--neg", required=True, help="transfers of style-0 inputs")
    ap.add_argument("--pos", required=True, help="transfers of style-1 inputs")
    ap.add_argument("--split", default="test")
    ap.add_argument("--out_dir", default="output")
    ap.add_argument("--column", type=int, default=0)
    ap.add_argument("--sep", default="\t")
    args = ap.parse_args()

    out_dir = os.path.join(args.out_dir, f"{args.dataset}-{args.ver}")
    os.makedirs(out_dir, exist_ok=True)
    for label, src in ((0, args.neg), (1, args.pos)):
        lines = extract(src, args.column, args.sep)
        dst = os.path.join(out_dir, f"style.{args.split}.{label}.tsf")
        with open(dst, "w", encoding="utf-8") as f:
            for line in lines:
                f.write(line.strip() + "\n")
        print(f"{dst}: {len(lines)} lines")


if __name__ == "__main__":
    main()
