"""Beam-vs-greedy A/B on an existing optimize checkpoint (VERDICT r2 item 8b).

The stretch config (BASELINE.json configs[4]) is "transformer backbone +
beam decode"; this tool measures what beam actually buys on the style
transfer task: it reuses a trained ``optimize-<src_ver>`` checkpoint, runs
the full test-mode transfer (train+test splits, the reference's
`src/main_optimize.py:243-255` contract) once with greedy decode and once
with beam, then evaluates both through the identical harness — metrics and
decode throughput side by side.

Usage: python tools/beam_ab.py [--base workdir/tpu] [--src_ver cptr_copym1]
       [--backbone transformer] [--beam 4]
Writes {base}/beam_ab_<src_ver>.json.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="workdir/tpu")
    ap.add_argument("--dataset", default="yelp")
    ap.add_argument("--src_ver", default="cptr_copym1")
    ap.add_argument("--backbone", default="transformer")
    ap.add_argument("--beam", type=int, default=4)
    ap.add_argument("--vocab", type=int, default=10000)
    args = ap.parse_args()

    from consistent__style_transfer_tpu.config import make_config
    from consistent__style_transfer_tpu.evaluate.prepare import run_prepare
    from consistent__style_transfer_tpu.evaluate.run_eval import run_eval
    from consistent__style_transfer_tpu.train.optimize import run_test

    b = args.base
    results: dict[str, dict] = {}
    for name, beam in (("greedy", 1), (f"beam{args.beam}", args.beam)):
        ver = f"{args.src_ver}_{name}"
        cfg = make_config(args.dataset)
        cfg.data_dir = f"{b}/data"
        cfg.dump_dir = f"{b}/dump"
        cfg.log_dir = f"{b}/log"
        cfg.out_dir = f"{b}/output"
        cfg.vocab_size = args.vocab
        cfg.backbone = args.backbone
        cfg.beam_size = beam
        cfg.ver = ver
        cfg.mode = "test"

        # run_test loads the newest G_epoch_* under optimize-<ver>; point a
        # copy of the trained checkpoint dir at each variant's ver
        src = f"{b}/dump/{args.dataset}/optimize-{args.src_ver}"
        dst = f"{b}/dump/{args.dataset}/optimize-{ver}"
        if not os.path.isdir(dst):
            shutil.copytree(src, dst)

        t0 = time.time()
        out_paths = run_test(cfg)
        wall = time.time() - t0
        n_sent = 0
        for pth in out_paths:
            with open(pth) as f:
                n_sent += sum(1 for _ in f)
        print(f"[beam_ab] {ver}: transfer {n_sent} sentences in {wall:.1f}s "
              f"({n_sent / wall:.0f} sent/s)", flush=True)

        eval_dir = f"{b}/evaluate_runtime"
        run_prepare(cfg.ds_data_dir, cfg.run_out_dir, eval_dir, cfg.dataset,
                    ver=ver, quiet=True)
        res = run_eval(cfg.ds_data_dir, cfg.run_out_dir, eval_dir,
                       cfg.dataset, ver)
        res["decode_wall_s"] = round(wall, 1)
        res["decode_sent_per_s"] = round(n_sent / wall, 1)
        res["beam_size"] = beam
        results[name] = res
        print(f"[beam_ab] {ver}: {json.dumps(res)}", flush=True)

    out_path = f"{b}/beam_ab_{args.src_ver}.json"
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    print(f"[beam_ab] wrote {out_path}")


if __name__ == "__main__":
    main()
