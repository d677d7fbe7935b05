"""Evaluate an already-transferred ablation sweep (VERDICT r1 item 8).

For each version (default: the job.sh sweep ab_full/ab_wo_*), run
eval-prepare (idempotent; trains the per-version NT adversarial classifier)
and the STI/CP/NT eval on the existing `output/<ds>-<ver>/*.tsf` files, then
print the results.md-style table. Mirrors the reference's ablation recipe
(src/job.sh:5-26 + results.md:3-7).

Usage:
  python tools/eval_ablations.py --base workdir/tpu --dataset yelp \
      [--platform cpu] [--vers ab_full,ab_wo_s,...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="workdir/tpu")
    ap.add_argument("--dataset", default="yelp")
    ap.add_argument("--vers",
                    default="ab_full,ab_wo_s,ab_wo_c,ab_wo_adv,ab_wo_bt,ab_wo_allc")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from consistent__style_transfer_tpu.evaluate.prepare import run_prepare
    from consistent__style_transfer_tpu.evaluate.run_eval import run_eval

    base, ds = args.base, args.dataset
    data_dir = f"{base}/data/{ds}"
    eval_dir = f"{base}/evaluate_runtime"
    results = {}
    for ver in args.vers.split(","):
        out_dir = f"{base}/output/{ds}-{ver}"
        if not os.path.exists(f"{out_dir}/style.test.0.tsf"):
            print(f"[ablate-eval] missing {out_dir}, skipping", flush=True)
            continue
        run_prepare(data_dir, out_dir, eval_dir, ds, ver=ver, quiet=True)
        results[ver] = run_eval(data_dir, out_dir, eval_dir, ds, ver, quiet=True)
        print(f"[ablate-eval] {ver}: {json.dumps(results[ver])}", flush=True)

    with open(f"{base}/ablation_results_{ds}.json", "w") as f:
        json.dump(results, f, indent=2)
    if results:
        cols = sorted(next(iter(results.values())).keys())
        print("| ver | " + " | ".join(cols) + " |")
        print("|---|" + "---|" * len(cols))
        for ver, res in results.items():
            print(f"| {ver} | " + " | ".join(
                f"{res[c]:.4f}" if isinstance(res[c], float) else str(res[c])
                for c in cols) + " |")


if __name__ == "__main__":
    main()
