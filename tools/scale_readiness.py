"""Real-corpus readiness check (VERDICT r1 item 10).

The reference's real Yelp corpus is ~270k sentences/style
(`/root/reference/.MISSING_LARGE_BLOBS`); this environment only carries the
2k-sentence dev files, so all round-1/2 training used 16k-line synthetic
stand-ins. This tool *measures* every host-side stage at real scale so that
dropping in the real corpus is a projected, not hoped-for, path:

  1. synthesize a 270k-lines/style corpus (dev x mult=135, same generator
     as the committed train files),
  2. time C++ BPE training over the 540k-line corpus,
  3. time C++ batch-encode of the full corpus to fixed-shape id arrays,
  4. time C++ word2vec (CBOW+NS, 10 epochs) over the token streams,
  5. time the pretrain collate (noising + Sinkhorn WMD labels) and the
     warmup/optimize collates per batch, and
  6. project per-stage wall-clock at real scale, folding in the measured
     on-chip sustained throughput (BENCH_r*.json sustained figure).

Usage: python tools/scale_readiness.py [--base workdir/scale] [--mult 135]
       [--out workdir/scale/readiness.json]
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

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="workdir/scale")
    ap.add_argument("--mult", type=int, default=135)
    ap.add_argument("--vocab", type=int, default=10000)
    ap.add_argument("--out", default="")
    ap.add_argument("--batch", type=int, default=256)
    args = ap.parse_args()
    out_path = args.out or f"{args.base}/readiness.json"
    res: dict = {"mult": args.mult, "vocab": args.vocab}

    data_dir = f"{args.base}/data"
    ds_dir = f"{data_dir}/yelp"
    t0 = time.time()
    if not os.path.exists(f"{ds_dir}/style.train.0"):
        subprocess.run([
            sys.executable, os.path.join(ROOT, "tools", "make_synthetic_train.py"),
            "yelp", "--dst", data_dir, "--mult", str(args.mult),
        ], check=True)
    res["synthesize_s"] = round(time.time() - t0, 2)

    files = [f"{ds_dir}/style.train.0", f"{ds_dir}/style.train.1"]
    n_lines = sum(sum(1 for _ in open(f)) for f in files)
    res["train_lines"] = n_lines
    print(f"[scale] corpus ready: {n_lines} lines ({res['synthesize_s']}s)",
          flush=True)

    from consistent__style_transfer_tpu.text import native as nat
    from consistent__style_transfer_tpu.text.bpe import build_cli
    from consistent__style_transfer_tpu.text.word2vec import train_token_w2v

    assert nat.available() or nat.build(), "native lib required"
    t0 = time.time()
    tok = build_cli("yelp", args.vocab, data_dir, f"{args.base}/dump")
    res["bpe_train_s"] = round(time.time() - t0, 2)
    print(f"[scale] BPE train ({args.vocab} vocab, C++ path): "
          f"{res['bpe_train_s']}s", flush=True)

    ntok = nat.NativeBPE(tok.vocab, tok.merges)
    lines = []
    for f in files:
        with open(f) as fh:
            lines += [ln.strip() for ln in fh]
    t0 = time.time()
    ids, lens = ntok.encode_batch(lines, max_len=18)
    res["encode_corpus_s"] = round(max(time.time() - t0, 1e-3), 3)
    res["encode_lines_per_s"] = round(n_lines / res["encode_corpus_s"])
    print(f"[scale] C++ batch-encode {n_lines} lines: "
          f"{res['encode_corpus_s']}s ({res['encode_lines_per_s']}/s)",
          flush=True)

    t0 = time.time()
    w2v = train_token_w2v(files, tok, epochs=10)
    res["w2v_train_s"] = round(time.time() - t0, 2)
    print(f"[scale] word2vec (10 epochs, d=100, production path incl. "
          f"tokenization): {res['w2v_train_s']}s", flush=True)

    # --- collate throughput (the host-side hot loop of each stage; the
    # production array-native path, data/pipeline.py collates) ---
    from consistent__style_transfer_tpu.data.noise import (
        rand_perm_arrays,
        transfer_noise_arrays,
    )
    from consistent__style_transfer_tpu.data.wmd_labels import SinkhornWmdLabeler

    labeler = SinkhornWmdLabeler(w2v, tok)

    rng = np.random.default_rng(0)
    B = args.batch
    sel = rng.integers(0, len(lens), B)
    bx, bl = ids[sel], lens[sel]
    noise_len = 18 + max(4, 18 // 2)

    t0 = time.time()
    iters = 10
    for _ in range(iters):
        nx1, nl1 = transfer_noise_arrays(bx, bl, 0.15, rng, out_len=noise_len)
        nx2, nl2 = transfer_noise_arrays(bx, bl, 0.15, rng, out_len=noise_len)
        _ = rand_perm_arrays(bx, bl, 0.15, rng)
        _ = labeler.label_pairs(nx1, nl1, nx2, nl2)
    dt = (time.time() - t0) / iters
    res["pretrain_collate_ms_per_batch"] = round(dt * 1e3, 1)
    res["pretrain_collate_sent_per_s"] = round(B / dt)
    print(f"[scale] pretrain collate (noise x3 + sinkhorn WMD labels): "
          f"{res['pretrain_collate_ms_per_batch']} ms/batch "
          f"({res['pretrain_collate_sent_per_s']} sent/s)", flush=True)

    t0 = time.time()
    for _ in range(iters):
        _ = transfer_noise_arrays(bx, bl, 0.1, rng, out_len=18)
    dt = (time.time() - t0) / iters
    res["warmup_collate_ms_per_batch"] = round(dt * 1e3, 1)
    res["warmup_collate_sent_per_s"] = round(B / dt)

    # --- projections at real scale (270k/style = 540k sentences/epoch) ---
    n_epoch_sents = n_lines
    sustained = None
    for bench in ("BENCH_r02.json", "BENCH_r01.json"):
        p = os.path.join(ROOT, bench)
        if os.path.exists(p):
            with open(p) as f:
                j = json.load(f)
            sustained = j.get("sustained_sentences_per_sec") or j.get("value")
            break
    res["device_sustained_sent_per_s"] = sustained
    proj = {}
    proj["bpe_train_s"] = res["bpe_train_s"]
    proj["w2v_train_s"] = res["w2v_train_s"]
    # pretrain host collate runs in the prefetcher; the epoch cost is
    # max(host collate, device step). Report both.
    proj["pretrain_epoch_host_s"] = round(
        n_epoch_sents / res["pretrain_collate_sent_per_s"], 1)
    if sustained:
        proj["optimize_epoch_device_s"] = round(n_epoch_sents / sustained, 1)
    proj["warmup_epoch_host_s"] = round(
        n_epoch_sents / res["warmup_collate_sent_per_s"], 1)
    res["projection"] = proj

    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(res, f, indent=2)
    print(json.dumps(res, indent=2))


if __name__ == "__main__":
    main()
