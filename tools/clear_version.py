"""Delete one run version's dump / log / output / adversarial-model artifacts
(reference ``src/scripts/clear.sh:5-8``).

Usage: python tools/clear_version.py <dataset> <ver> [--base .] [--yes]
"""

from __future__ import annotations

import argparse
import os
import shutil


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("dataset")
    ap.add_argument("ver")
    ap.add_argument("--base", default=".")
    ap.add_argument("--yes", action="store_true", help="skip confirmation")
    args = ap.parse_args()
    b, ds, ver = args.base, args.dataset, args.ver
    targets = [
        f"{b}/dump/{ds}/optimize-{ver}",
        f"{b}/log/{ds}/optimize-{ver}",
        f"{b}/output/{ds}-{ver}",
        f"{b}/output/{ds}-{ver}.txt",
        f"{b}/evaluate_runtime/eval_dump/adv_models/unigram_lr_{ver}_{ds}.bin",
    ]
    existing = [t for t in targets if os.path.exists(t)]
    if not existing:
        print("nothing to delete")
        return
    for t in existing:
        print("delete:", t)
    if not args.yes:
        if input("proceed? [y/N] ").strip().lower() != "y":
            return
    for t in existing:
        if os.path.isdir(t):
            shutil.rmtree(t)
        else:
            os.remove(t)


if __name__ == "__main__":
    main()
