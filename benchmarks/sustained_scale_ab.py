"""Sustained-throughput A/B at REFERENCE data scale: megastep k vs per-batch.

The bench corpus (16k sentences/style) has 4-second optimize epochs, so the
sustained number there is dominated by per-epoch validation and cannot
resolve per-dispatch overheads. The reference trains on 270k-540k
sentences/style (`/root/reference/src/arguments.py:39-46`), where round-4's
full rehearsals sustained 5,908 sent/s against 8,710 benched — a 32% gap
attributed to host/dispatch overhead that only materializes at ~2,100
dispatches/epoch. This script isolates that regime:

  synthesize a mult x corpus -> seed random frozen/warmup weights through the
  production save/load path (throughput is weight-independent) ->
  run_optimize(epochs=2) once per requested k -> print per-epoch stats.

Epoch 0 carries the compiles; epoch 1 is steady state. Same harness as
bench.measure_sustained, just scaled and parameterized.

Usage: python benchmarks/sustained_scale_ab.py [--mult 135] [--ks 1,8]
       [--epochs 2] [--out artifacts/round5/sustained_scale_ab.json]
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
    ap.add_argument("--ks", default="1,8")
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--base", default="workdir/scale_ab")
    ap.add_argument("--out", default="artifacts/round5/sustained_scale_ab.json")
    args = ap.parse_args()

    base = os.path.join(ROOT, args.base)
    data_dir = os.path.join(base, "data")
    train0 = os.path.join(data_dir, "yelp", "style.train.0")
    if not os.path.exists(train0):
        subprocess.run(
            [sys.executable, os.path.join(ROOT, "tools", "make_synthetic_train.py"),
             "yelp", "--dst", data_dir, "--mult", str(args.mult)],
            check=True, cwd=ROOT)

    import jax
    import jax.numpy as jnp

    import bench
    from consistent__style_transfer_tpu.config import make_config
    from consistent__style_transfer_tpu.train.common import get_tokenizer
    from consistent__style_transfer_tpu.train.optimize import (
        OptimizeModels,
        run_optimize,
    )
    from consistent__style_transfer_tpu.train.state import save_params
    from consistent__style_transfer_tpu.train.warmup import warmup_ckpt_name

    bench._enable_xla_cache()
    bench._devices_with_retry()

    record: dict = {"mult": args.mult, "epochs": args.epochs,
                    "n_train_sentences": 2 * args.mult * 2000, "runs": {}}
    for k in (int(x) for x in args.ks.split(",")):
        cfg = make_config(
            "yelp",
            data_dir=data_dir,
            dump_dir=os.path.join(base, f"dump_k{k}"),
            log_dir=os.path.join(base, f"log_k{k}"),
            out_dir=os.path.join(base, f"out_k{k}"),
            epochs=args.epochs,
            ver=f"ab_k{k}",
        )
        cfg.megastep_k = k

        tok = get_tokenizer(cfg)
        models = OptimizeModels(cfg, len(tok))
        key = jax.random.PRNGKey(0)
        x0 = jnp.zeros((2, cfg.max_len), jnp.int32)
        l0 = jnp.zeros((2,), jnp.int32)
        n0 = jnp.zeros((2, cfg.max_len + cfg.max_len // 2), jnp.int32)
        kc, km, kn, kg = jax.random.split(key, 4)
        pre = os.path.join(cfg.ds_dump_dir, "pretrain")
        os.makedirs(pre, exist_ok=True)
        save_params(models.classifier.init(kc, x0), os.path.join(pre, "cls.msgpack"))
        save_params(models.matcher.init(km, n0, n0), os.path.join(pre, "mat.msgpack"))
        save_params(models.nt_checker.init(kn, x0), os.path.join(pre, "dn.msgpack"))
        warm = os.path.join(cfg.ds_dump_dir, "warmup")
        os.makedirs(warm, exist_ok=True)
        save_params(
            models.generator.init(kg, x0, l0, None, l0, deterministic=True),
            os.path.join(warm, warmup_ckpt_name(cfg)),
        )

        stats: list[dict] = []
        t0 = time.time()
        run_optimize(cfg, progress=False, stats=stats)
        record["runs"][f"k{k}"] = {
            "wall_s": round(time.time() - t0, 1),
            "per_epoch": stats,
            "steady_sent_per_s": round(stats[-1]["sentences_per_sec"], 1),
        }
        print(f"[scale_ab] k={k}: steady "
              f"{stats[-1]['sentences_per_sec']:.1f} sent/s "
              f"(wall {record['runs'][f'k{k}']['wall_s']}s)", flush=True)

    out = os.path.join(ROOT, args.out)
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps({k: v["steady_sent_per_s"]
                      for k, v in record["runs"].items()}))


if __name__ == "__main__":
    main()
