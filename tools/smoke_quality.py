"""Quality smoke run: full pretrain -> warmup -> optimize -> infer -> eval on
a (subsampled) dataset; prints STI/CP/NT. CPU-runnable; on TPU this is the
real pipeline at small scale.

Usage: python tools/smoke_quality.py [--dataset yelp_smoke] [--base workdir/smoke]
       [--epochs 2] [--platform cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="yelp_smoke")
    ap.add_argument("--base", default="workdir/smoke")
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--warmup_epochs", type=int, default=2)
    ap.add_argument("--batch", type=int, default=None,
                    help="override the dataset preset's batch (yelp 256, "
                    "book 128); default keeps the preset")
    ap.add_argument("--vocab", type=int, default=6000)
    ap.add_argument("--backbone", default="lstm")
    ap.add_argument("--platform", default=None, help="cpu to force CPU")
    ap.add_argument("--skip", default="", help="comma list: pretrain,warmup")
    ap.add_argument("--ver", default="smoke")
    ap.add_argument("--set", action="append", default=[],
                    help="extra Config overrides, e.g. --set w_c=1.0")
    args = ap.parse_args()
    skip = set(args.skip.split(",")) if args.skip else set()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from consistent__style_transfer_tpu.config import make_config
    from consistent__style_transfer_tpu.evaluate.prepare import run_prepare
    from consistent__style_transfer_tpu.evaluate.run_eval import run_eval
    from consistent__style_transfer_tpu.train.optimize import run_optimize, run_test
    from consistent__style_transfer_tpu.train.pretrain import run_pretrain
    from consistent__style_transfer_tpu.train.warmup import run_warmup

    b = args.base
    # shape preset follows the dataset family: book runs at its own
    # max_len 30 / batch 128 (reference book.sh), everything else yelp-shaped
    cfg = make_config("book" if args.dataset.startswith("book") else "yelp")
    cfg.dataset = args.dataset
    cfg.data_dir = f"{b}/data"
    cfg.dump_dir = f"{b}/dump"
    cfg.log_dir = f"{b}/log"
    cfg.out_dir = f"{b}/output"
    cfg.ver = args.ver
    cfg.vocab_size = args.vocab
    if args.batch is not None:
        cfg.batch_size = args.batch
        cfg.warmup_batch_size = min(512, args.batch * 2)
    cfg.epochs = args.epochs
    cfg.warmup_epochs = args.warmup_epochs
    cfg.backbone = args.backbone
    for kv in args.set:
        k, v = kv.split("=", 1)
        cur = getattr(cfg, k)
        setattr(cfg, k, type(cur)(v) if not isinstance(cur, bool) else v in ("1", "true"))

    t0 = time.time()
    if "pretrain" not in skip:
        print("[smoke] pretrain ...", flush=True)
        run_pretrain(cfg)
        print(f"[smoke] pretrain done ({time.time()-t0:.0f}s)", flush=True)
    if "warmup" not in skip:
        run_warmup(cfg)
        print(f"[smoke] warmup done ({time.time()-t0:.0f}s)", flush=True)
    run_optimize(cfg)
    print(f"[smoke] optimize done ({time.time()-t0:.0f}s)", flush=True)
    cfg.mode = "test"
    run_test(cfg)
    print(f"[smoke] inference done ({time.time()-t0:.0f}s)", flush=True)

    eval_dir = f"{b}/evaluate_runtime"
    run_prepare(cfg.ds_data_dir, cfg.run_out_dir, eval_dir, cfg.dataset, ver=cfg.ver)
    res = run_eval(cfg.ds_data_dir, cfg.run_out_dir, eval_dir, cfg.dataset, cfg.ver)
    res["wall_s"] = time.time() - t0
    res["backbone"] = cfg.backbone
    print("[smoke] RESULT " + json.dumps(res), flush=True)
    with open(f"{b}/result_{cfg.ver}.json", "w") as f:
        json.dump(res, f, indent=2)


if __name__ == "__main__":
    main()
