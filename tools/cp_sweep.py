"""Content-preservation sweep (VERDICT r1 item 3).

Round 1's generator learned to *rewrite* rather than *edit*: CP stalled at
~0.50 (lower=better) and self-BLEU at ~10-12 across hparam variants. This
driver attacks it with the round-2 levers, sharing one pretrain and one
long warmup across all optimize variants:

  - Config.w_rec   — same-style teacher-forced reconstruction CE in the
                     optimize G loss (copy bias)
  - Config.rep_penalty — greedy-decode repetition penalty
  - longer warmup  — the reference's DAE gets its copying bias from real
                     270k-sentence corpora; compensate with more epochs
  - w_s / w_c re-weighting

Each variant is a subprocess `tools/smoke_quality.py` run (fresh process =
clean jit cache); metrics land in {base}/result_<ver>.json and are collated
into {base}/cp_sweep.json.

Usage: python tools/cp_sweep.py [--base workdir/tpu] [--epochs 10]
       [--warmup_epochs 40] [--only ver1,ver2]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

VARIANTS = [
    # (ver, backbone, extra --set overrides)
    ("cp_base", "lstm", []),                     # long-warmup control
    ("cp_rec1", "lstm", ["w_rec=1.0"]),
    ("cp_rec1_rp", "lstm", ["w_rec=1.0", "rep_penalty=0.5"]),
    # w_rec (teacher-forced) measured ineffective: CP 0.504/0.498/0.515
    # across w_rec 0/1/1+rp. Round-2b lever: w_copy — NLL of the source
    # under the FREE-RUNNING transfer distribution (train/optimize.py).
    # UNIFORM copy (copy_mask=0) collapses ACC (cp_copy03: 0.47) because it
    # also pins style words; the masked variants below weight the copy NLL
    # by per-token style-neutrality (data/style_weights.py).
    ("cp_copy03", "lstm", ["w_copy=0.3", "copy_mask=0"]),
    ("cp_copy1", "lstm", ["w_copy=1.0", "copy_mask=0"]),
    ("cp_copym03", "lstm", ["w_copy=0.3"]),
    ("cp_copym1", "lstm", ["w_copy=1.0"]),
    ("cp_copym3", "lstm", ["w_copy=3.0"]),
    ("cp_copym1_rp", "lstm", ["w_copy=1.0", "rep_penalty=0.5"]),
    # best-balance point + decode repetition penalty (degeneration is what
    # keeps masked-WMD CP at ~0.49 even when structure copies)
    ("cp_copym03_rp", "lstm", ["w_copy=0.3", "rep_penalty=0.5"]),
    # bf16 A/B vs cp_base (VERDICT r1 item 9): same recipe, compute dtype
    # flipped — quality-neutral => flip the bench/pipeline default.
    ("cp_base_bf16", "lstm", ["dtype=bfloat16"]),
    ("cptr_copym1", "transformer", ["w_copy=1.0"]),
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="workdir/tpu")
    ap.add_argument("--dataset", default="yelp")
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--warmup_epochs", type=int, default=40)
    ap.add_argument("--vocab", type=int, default=10000)
    ap.add_argument("--only", default="")
    args = ap.parse_args()
    only = set(args.only.split(",")) if args.only else None

    os.makedirs(f"{args.base}/data", exist_ok=True)
    link = f"{args.base}/data/{args.dataset}"
    if not os.path.exists(link):
        os.symlink(os.path.join(ROOT, "data", args.dataset), link)

    done_warmup = set()  # backbones whose pretrain+warmup already ran
    collated = {}
    sweep_path = f"{args.base}/cp_sweep.json"
    if os.path.exists(sweep_path):  # merge, don't clobber, on --only reruns
        with open(sweep_path) as f:
            collated = json.load(f)
    for ver, backbone, sets in VARIANTS:
        if only and ver not in only:
            continue
        res_path = f"{args.base}/result_{ver}.json"
        if os.path.exists(res_path):
            with open(res_path) as f:
                collated[ver] = json.load(f)
            done_warmup.add(backbone)
            print(f"[sweep] {ver}: cached {json.dumps(collated[ver])}",
                  flush=True)
            continue
        cmd = [
            sys.executable, os.path.join(ROOT, "tools", "smoke_quality.py"),
            "--dataset", args.dataset, "--base", args.base,
            "--epochs", str(args.epochs),
            "--warmup_epochs", str(args.warmup_epochs),
            "--vocab", str(args.vocab), "--backbone", backbone,
            "--ver", ver,
        ]
        # skip stages whose artifacts already exist on disk (covers --only
        # invocations where no cached variant populated done_warmup)
        warm_name = ("G_transformer.msgpack" if backbone == "transformer"
                     else "G.msgpack")
        have_pretrain = os.path.exists(
            f"{args.base}/dump/{args.dataset}/pretrain/cls.msgpack")
        have_warmup = os.path.exists(
            f"{args.base}/dump/{args.dataset}/warmup/{warm_name}")
        skips = ["pretrain"] if (done_warmup or have_pretrain) else []
        if backbone in done_warmup or have_warmup:
            skips.append("warmup")
        if skips:
            cmd += ["--skip", ",".join(skips)]
        for kv in sets:
            cmd += ["--set", kv]
        print(f"[sweep] {ver}: {' '.join(cmd)}", flush=True)
        t0 = time.time()
        rc = subprocess.run(cmd).returncode
        print(f"[sweep] {ver}: rc={rc} ({time.time()-t0:.0f}s)", flush=True)
        if rc == 0 and os.path.exists(res_path):
            with open(res_path) as f:
                collated[ver] = json.load(f)
            done_warmup.add(backbone)
        with open(f"{args.base}/cp_sweep.json", "w") as f:
            json.dump(collated, f, indent=2)

    for ver, res in collated.items():
        print(ver, json.dumps(res))


if __name__ == "__main__":
    main()
