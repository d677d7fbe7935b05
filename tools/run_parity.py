"""Controlled quality-parity experiment (VERDICT r1 item 2).

Trains BOTH systems — this framework (JAX/TPU) and the reference-recipe
torch mirror (benchmarks/torch_mirror.py) — on the SAME subsampled corpus
with the SAME tokenizer/w2v artifacts and the SAME hyperparameters, then
scores both .tsf output sets with the SAME evaluation harness
(STI/CP/NT/ACC/self-BLEU). Result: {base}/parity.json + a markdown row pair.

Stages (each skippable so the slow torch leg can run detached):
  data   — build {base}/data/yelp_small via tools/make_parity_data.py logic
  jax    — full pipeline for ver=jax (pretrain/warmup/optimize/test)
  torch  — subprocess benchmarks/torch_mirror.py --stage all (hours on CPU)
  eval   — eval-prepare + eval for both output dirs, write parity.json

Usage:
  python tools/run_parity.py --base workdir/parity --only jax
  nice -n 19 python tools/run_parity.py --base workdir/parity --only torch
  python tools/run_parity.py --base workdir/parity --only eval
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DS = "yelp_small"


def ensure_data(base: str, src: str) -> str:
    dst = f"{base}/data/{DS}"
    if not os.path.exists(f"{dst}/style.train.0"):
        from tools.make_parity_data import sample_file

        os.makedirs(dst, exist_ok=True)
        caps = {"train": 2000, "dev": 500, "test": None}
        for split, cap in caps.items():
            for style in (0, 1):
                sample_file(f"{src}/style.{split}.{style}",
                            f"{dst}/style.{split}.{style}", cap, style)
        for style in (0, 1):
            ref = f"{src}/reference.{style}"
            if os.path.exists(ref):
                sample_file(ref, f"{dst}/reference.{style}", None, 0)
    return dst


def make_cfg(base: str, args):
    from consistent__style_transfer_tpu.config import make_config

    cfg = make_config("yelp")
    cfg.dataset = DS
    cfg.data_dir = f"{base}/data"
    cfg.dump_dir = f"{base}/dump"
    cfg.log_dir = f"{base}/log"
    cfg.out_dir = f"{base}/output"
    cfg.ver = "jax"
    cfg.vocab_size = args.vocab
    cfg.epochs = args.epochs
    cfg.warmup_epochs = args.warmup_epochs
    return cfg


def run_jax(base: str, args) -> None:
    from consistent__style_transfer_tpu.train.optimize import run_optimize, run_test
    from consistent__style_transfer_tpu.train.pretrain import run_pretrain
    from consistent__style_transfer_tpu.train.warmup import run_warmup

    cfg = make_cfg(base, args)
    t0 = time.time()
    run_pretrain(cfg)
    print(f"[parity-jax] pretrain done ({time.time()-t0:.0f}s)", flush=True)
    run_warmup(cfg)
    print(f"[parity-jax] warmup done ({time.time()-t0:.0f}s)", flush=True)
    run_optimize(cfg)
    print(f"[parity-jax] optimize done ({time.time()-t0:.0f}s)", flush=True)
    cfg.mode = "test"
    run_test(cfg)
    print(f"[parity-jax] test done ({time.time()-t0:.0f}s)", flush=True)


def run_torch(base: str, args) -> None:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cmd = [
        sys.executable, os.path.join(root, "benchmarks", "torch_mirror.py"),
        "--data", f"{base}/data/{DS}",
        "--dump", f"{base}/dump_torch",
        "--out", f"{base}/output/{DS}-torch",
        "--shared", f"{base}/dump/{DS}",
        "--vocab", str(args.vocab),
        "--warmup_epochs", str(args.warmup_epochs),
        "--epochs", str(args.epochs),
        "--stage", args.torch_stage,
    ]
    print("[parity-torch]", " ".join(cmd), flush=True)
    subprocess.run(cmd, check=True)


def run_evals(base: str) -> dict:
    from consistent__style_transfer_tpu.evaluate.prepare import run_prepare
    from consistent__style_transfer_tpu.evaluate.run_eval import run_eval

    data_dir = f"{base}/data/{DS}"
    eval_dir = f"{base}/evaluate_runtime"
    out = {}
    for ver in ("jax", "torch"):
        out_dir = f"{base}/output/{DS}-{ver}"
        if not os.path.exists(f"{out_dir}/style.test.0.tsf"):
            print(f"[parity-eval] missing {out_dir}, skipping", flush=True)
            continue
        run_prepare(data_dir, out_dir, eval_dir, DS, ver=ver)
        out[ver] = run_eval(data_dir, out_dir, eval_dir, DS, ver)
        print(f"[parity-eval] {ver}: {json.dumps(out[ver])}", flush=True)
    with open(f"{base}/parity.json", "w") as f:
        json.dump(out, f, indent=2)
    if len(out) == 2:
        cols = sorted(set(out["jax"]) & set(out["torch"]))
        print("| system | " + " | ".join(cols) + " |")
        print("|---|" + "---|" * len(cols))
        for ver in ("torch", "jax"):
            print(f"| {ver} | " + " | ".join(
                f"{out[ver][c]:.4f}" if isinstance(out[ver][c], float)
                else str(out[ver][c]) for c in cols) + " |")
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="workdir/parity")
    ap.add_argument("--src", default="data/yelp")
    ap.add_argument("--vocab", type=int, default=6000)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--warmup_epochs", type=int, default=10)
    ap.add_argument("--only", default="all",
                    choices=["all", "data", "jax", "torch", "eval"])
    ap.add_argument("--torch_stage", default="all")
    args = ap.parse_args()
    base = args.base
    ensure_data(base, args.src)
    if args.only in ("all", "jax"):
        run_jax(base, args)
    if args.only in ("all", "torch"):
        run_torch(base, args)
    if args.only in ("all", "eval"):
        run_evals(base)


if __name__ == "__main__":
    main()
