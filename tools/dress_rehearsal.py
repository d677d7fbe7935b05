"""Full-scale dress rehearsal (VERDICT r2 item 1): the COMPLETE pipeline at
the reference's data scale — 270k sentences/style (`/root/reference/src/
arguments.py:39-46`, `.MISSING_LARGE_BLOBS`) — run end to end ON THE CHIP:

  corpus synth (mult x dev) -> vocab -> w2v -> pretrain -> warmup ->
  optimize(train) -> optimize(test: train+test split transfer) ->
  eval-prepare -> eval (STI / CP / NT / ACC / BLEU)

Per-stage wall-clock, sustained sentences/sec, and the final metric row are
written to --out (default workdir/rehearsal/rehearsal.json). Every stage is
the production code path (cli.py commands in-process); nothing is projected.

Usage: python tools/dress_rehearsal.py [--mult 135] [--base workdir/rehearsal]
       [--dataset yelp] [--epochs 10] [--ver dress] [--skip-done]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=135)
    ap.add_argument("--base", default="workdir/rehearsal")
    ap.add_argument("--dataset", default="yelp")
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--pretrain-epochs", type=int, default=10)
    ap.add_argument("--ver", default="dress")
    ap.add_argument("--out", default="")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--w-copy", type=float, default=None)
    ap.add_argument("--w-copy-decay", type=float, default=None)
    ap.add_argument("--w-s", type=float, default=None,
                    help="style-CE weight override (reference default 0.1) — "
                    "the operating-point lever for the NT-band control runs")
    ap.add_argument("--preset", default=None,
                    help="named Config preset (config.PRESETS), e.g. "
                    "ref_band — the shipped band-matching operating point; "
                    "explicit flags still win")
    ap.add_argument("--warmup-epochs", type=int, default=None)
    ap.add_argument("--rng-impl", default=None, choices=["threefry", "rbg"],
                    help="PRNG behind dropout/sampling keys (Config.rng_impl)")
    ap.add_argument("--recombine", type=float, default=0.0,
                    help="same-style splice fraction for the synthetic "
                    "corpus (tools/make_synthetic_train.py --recombine)")
    ap.add_argument("--skip-done", action="store_true",
                    help="skip stages whose artifacts already exist")
    ap.add_argument("--real-data", action="store_true",
                    help="use pre-existing style.train.{0,1} under "
                    "<base>/data/<dataset>/ (the reference's real-corpus "
                    "drop-in contract, src/loader.py:10-40) instead of "
                    "generating a synthetic corpus")
    ap.add_argument("--stop-after", default="",
                    help="stop after this stage (corpus|vocab|w2v) — used by "
                    "tests to validate the data seam without training")
    ap.add_argument("--set", action="append", default=[], dest="overrides",
                    help="extra Config overrides applied to every stage, "
                    "e.g. --set backbone=transformer (same contract as "
                    "tools/smoke_quality.py)")
    args = ap.parse_args()
    base = os.path.abspath(args.base)
    out_path = args.out or f"{base}/rehearsal.json"
    res: dict = {"mult": args.mult, "dataset": args.dataset,
                 "dtype": args.dtype, "stages": {}}
    if os.path.exists(out_path):
        with open(out_path) as f:
            res = json.load(f)
        res.setdefault("stages", {})

    def record(name, dt, **extra):
        res["stages"][name] = {"wall_s": round(dt, 1), **extra}
        os.makedirs(os.path.dirname(out_path), exist_ok=True)
        with open(out_path, "w") as f:
            json.dump(res, f, indent=2)
        print(f"[rehearsal] {name}: {dt:.1f}s {extra}", flush=True)

    # --- 1. corpus at reference scale ---
    data_dir = f"{base}/data"
    ds_dir = f"{data_dir}/{args.dataset}"
    t0 = time.time()
    corpus_meta = ({"real": True} if args.real_data
                   else {"mult": args.mult, "recombine": args.recombine})
    meta_path = f"{ds_dir}/corpus_meta.json"
    if args.real_data:
        # the reference's drop-in contract (src/loader.py:10-40): the user
        # provides style.train.{0,1} (one sentence per line, label = filename
        # suffix) under <base>/data/<dataset>/ — validate, never synthesize
        from consistent__style_transfer_tpu.data.corpus import (
            validate_style_file,
        )

        if os.path.exists(meta_path):
            with open(meta_path) as f:
                old = json.load(f)
            if not old.get("real"):
                # the train files present are a SYNTHETIC corpus from a
                # prior run — format validation alone cannot tell; refuse
                # rather than relabel stand-ins as real measurements
                raise SystemExit(
                    f"--real-data: {ds_dir} holds a synthetic corpus "
                    f"(corpus_meta {old}); delete style.train.* (and the "
                    "meta) and drop in the real files first")
        stats = {}
        for s in (0, 1):
            p = f"{ds_dir}/style.train.{s}"
            if not os.path.exists(p):
                raise SystemExit(
                    f"--real-data: drop the real corpus at {p} first "
                    "(one sentence per line; style id = filename suffix, "
                    "reference src/loader.py:34-40)")
            stats[s] = validate_style_file(p)
        print(f"[rehearsal] real corpus validated: {stats}", flush=True)
        os.makedirs(ds_dir, exist_ok=True)
        with open(meta_path, "w") as f:
            json.dump(corpus_meta, f)
    elif os.path.exists(f"{ds_dir}/style.train.0"):
        # guard against silently measuring a stale corpus: an existing train
        # file generated with different --mult/--recombine invalidates the run
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                old = json.load(f)
            if old != corpus_meta:
                raise SystemExit(
                    f"{ds_dir} already holds a synthetic corpus generated "
                    f"with {old}, but this run asked for {corpus_meta}; use "
                    "a fresh --base (or delete the corpus) instead of "
                    "measuring the stale one")
        else:
            # pre-meta base (corpus written before this guard existed):
            # adopt it ONLY under the tool's default generation parameters —
            # keeping --skip-done resumption for the common case without
            # letting a non-default request mislabel an unknown corpus
            if (args.mult == ap.get_default("mult")
                    and args.recombine == ap.get_default("recombine")):
                print(f"[rehearsal] {ds_dir} has no corpus_meta.json; "
                      f"adopting the existing corpus as {corpus_meta}",
                      flush=True)
                with open(meta_path, "w") as f:
                    json.dump(corpus_meta, f)
            else:
                raise SystemExit(
                    f"{ds_dir} holds a corpus with no corpus_meta.json "
                    f"(generated with unknown parameters), and this run "
                    f"asked for non-default {corpus_meta}; use a fresh "
                    "--base (or delete the corpus) instead of relabeling it")
    else:
        cmd = [
            sys.executable, os.path.join(ROOT, "tools", "make_synthetic_train.py"),
            args.dataset, "--dst", data_dir, "--mult", str(args.mult),
        ]
        if args.recombine:
            cmd += ["--recombine", str(args.recombine)]
        subprocess.run(cmd, check=True)
        os.makedirs(ds_dir, exist_ok=True)
        with open(meta_path, "w") as f:
            json.dump(corpus_meta, f)
    # dev/test/reference files come straight from the committed corpus
    for name in os.listdir(os.path.join(ROOT, "data", args.dataset)):
        if name.startswith("style.train."):
            continue
        src = os.path.join(ROOT, "data", args.dataset, name)
        dst = os.path.join(ds_dir, name)
        if not os.path.exists(dst):
            import shutil

            shutil.copy(src, dst)
    n_train = sum(
        sum(1 for _ in open(f"{ds_dir}/style.train.{s}")) for s in (0, 1))
    record("corpus", time.time() - t0, train_lines=n_train,
           **({"real": True} if args.real_data else {}))
    if args.stop_after == "corpus":
        return

    from consistent__style_transfer_tpu.config import make_config

    def cfg_for(stage_mode: str = "train"):
        cfg = make_config(
            args.dataset,
            preset=args.preset,
            data_dir=data_dir,
            dump_dir=f"{base}/dump",
            log_dir=f"{base}/log",
            out_dir=f"{base}/output",
            epochs=args.epochs,
            ver=args.ver,
        )
        cfg.dtype = args.dtype
        cfg.mode = stage_mode
        if args.w_copy is not None:
            cfg.w_copy = args.w_copy
        if args.w_copy_decay is not None:
            cfg.w_copy_decay = args.w_copy_decay
        if args.w_s is not None:
            cfg.w_s = args.w_s
        if args.rng_impl is not None:
            cfg.rng_impl = args.rng_impl
        if args.warmup_epochs is not None:
            cfg.warmup_epochs = args.warmup_epochs
        for kv in args.overrides:
            k, v = kv.split("=", 1)
            cur = getattr(cfg, k)  # unknown keys raise loudly
            setattr(cfg, k,
                    v in ("1", "true") if isinstance(cur, bool) else type(cur)(v))
        return cfg

    cfg = cfg_for()

    # --- 2. vocab ---
    from consistent__style_transfer_tpu.train.common import get_tokenizer

    t0 = time.time()
    tok = get_tokenizer(cfg)
    record("vocab", time.time() - t0, vocab=len(tok))
    if args.stop_after == "vocab":
        return

    # --- 3. w2v ---
    from consistent__style_transfer_tpu.train.common import get_w2v

    t0 = time.time()
    w2v = get_w2v(cfg, tok)
    record("w2v", time.time() - t0, w2v_vocab=len(w2v.vocab))
    del w2v
    if args.stop_after == "w2v":
        return

    # --- 4. pretrain ---
    pre_done = all(
        os.path.exists(f"{base}/dump/{args.dataset}/pretrain/{t}.msgpack")
        for t in ("cls", "mat", "dn"))
    if not (args.skip_done and pre_done):
        from consistent__style_transfer_tpu.train.pretrain import run_pretrain

        pcfg = cfg_for()
        pcfg.epochs = args.pretrain_epochs
        t0 = time.time()
        run_pretrain(pcfg)
        dt = time.time() - t0
        record("pretrain", dt,
               sent_per_s=round(n_train * args.pretrain_epochs / dt, 1),
               note="upper bound rate: counts all epochs incl. early-stop")

    # --- 5. warmup ---
    from consistent__style_transfer_tpu.train.warmup import warmup_ckpt_name

    warm_path = f"{base}/dump/{args.dataset}/warmup/{warmup_ckpt_name(cfg)}"
    if not (args.skip_done and os.path.exists(warm_path)):
        from consistent__style_transfer_tpu.train.warmup import run_warmup

        t0 = time.time()
        run_warmup(cfg_for())
        dt = time.time() - t0
        record("warmup", dt, sent_per_s=round(n_train / dt, 1))

    # --- 6. optimize (train) ---
    from consistent__style_transfer_tpu.train.optimize import run_optimize, run_test

    opt_dump = f"{base}/dump/{args.dataset}/optimize-{args.ver}"
    have_g = os.path.isdir(opt_dump) and any(
        n.startswith("G_epoch") for n in os.listdir(opt_dump))
    if not (args.skip_done and have_g):
        stats: list = []
        t0 = time.time()
        run_optimize(cfg_for(), stats=stats)
        dt = time.time() - t0
        sustained = stats[-1]["sentences_per_sec"] if stats else None
        record("optimize_train", dt, epochs_run=len(stats),
               sustained_sent_per_s=round(sustained, 1) if sustained else None,
               per_epoch=[{k: (round(v, 1) if isinstance(v, float) else v)
                           for k, v in s.items()} for s in stats])

    # --- 7. optimize (test): transfer train+test splits ---
    tsf = f"{base}/output/{args.dataset}-{args.ver}/style.test.0.tsf"
    if not (args.skip_done and os.path.exists(tsf)):
        t0 = time.time()
        run_test(cfg_for("test"))
        dt = time.time() - t0
        n_dec = n_train + sum(
            sum(1 for _ in open(f"{ds_dir}/style.test.{s}")) for s in (0, 1))
        record("optimize_test", dt, sentences=n_dec,
               decode_sent_per_s=round(n_dec / dt, 1))

    # --- 8. eval prepare + eval ---
    from consistent__style_transfer_tpu.evaluate.prepare import run_prepare
    from consistent__style_transfer_tpu.evaluate.run_eval import run_eval

    eval_dir = f"{base}/evaluate_runtime"
    run_out = f"{base}/output/{args.dataset}-{args.ver}"
    t0 = time.time()
    pp = run_prepare(ds_dir, run_out, eval_dir, args.dataset, ver=args.ver,
                     seed=cfg.seed)
    record("eval_prepare", time.time() - t0, **pp.get("timings", {}))

    t0 = time.time()
    metrics = run_eval(ds_dir, run_out, eval_dir, args.dataset, args.ver)
    record("eval", time.time() - t0, **{
        k: (round(float(v), 4) if isinstance(v, (int, float)) else v)
        for k, v in (metrics or {}).items()})

    res["total_wall_s"] = round(
        sum(s.get("wall_s", 0) for s in res["stages"].values()), 1)
    with open(out_path, "w") as f:
        json.dump(res, f, indent=2)
    print(json.dumps(res, indent=2))


if __name__ == "__main__":
    main()
