"""Probe Mosaic compilability of the Pallas Sinkhorn kernel (VERDICT item 5).

The round-1 finding was that this environment's remote Mosaic compile helper
rejects the kernel (HTTP 500) at the default tiling (GROUP=8, LANES=128).
This probe sweeps (group, lanes) variants at the production WMD shape
(B=256 pairs, N=M=48 atoms) and, for any variant that compiles, checks
numerics against the jnp Sinkhorn and times it the amortized way.

Usage: python benchmarks/probe_sinkhorn.py [--out workdir/sinkhorn_probe.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="workdir/sinkhorn_probe.json")
    ap.add_argument("--pairs", type=int, default=256)
    ap.add_argument("--atoms", type=int, default=48)
    ap.add_argument("--iters", type=int, default=100)
    args = ap.parse_args()

    from consistent__style_transfer_tpu.kernels.sinkhorn import sinkhorn_pallas
    from consistent__style_transfer_tpu.ops.emd import sinkhorn_ot_cost

    B, N = args.pairs, args.atoms
    key = jax.random.PRNGKey(0)
    kp, kq, kd = jax.random.split(key, 3)
    # simplex-ish masses with some zero atoms (mirrors BoW WMD inputs)
    kp1, kp2 = jax.random.split(kp)
    kq1, kq2 = jax.random.split(kq)
    p = jax.random.uniform(kp1, (B, N)) * (jax.random.uniform(kp2, (B, N)) > 0.3)
    q = jax.random.uniform(kq1, (B, N)) * (jax.random.uniform(kq2, (B, N)) > 0.3)
    p = p / jnp.maximum(p.sum(-1, keepdims=True), 1e-9)
    q = q / jnp.maximum(q.sum(-1, keepdims=True), 1e-9)
    D = jax.random.uniform(kd, (B, N, N))

    ref = np.asarray(sinkhorn_ot_cost(p, q, D, n_iters=args.iters))

    def time_jnp():
        f = jax.jit(lambda p, q, D: sinkhorn_ot_cost(p, q, D,
                                                     n_iters=args.iters))
        np.asarray(f(p, q, D))
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(f(p, q, D))
            times.append(time.perf_counter() - t0)
        return float(min(times) * 1e3)

    results = {"jnp_ms": round(time_jnp(), 3), "variants": []}
    print(f"jnp sinkhorn: {results['jnp_ms']} ms / {B} pairs", flush=True)

    from consistent__style_transfer_tpu.kernels.sinkhorn import (
        sinkhorn_pallas_cr,
    )

    def probe(row, fn):
        try:
            got = np.asarray(fn())
            row["compiled"] = True
            row["max_abs_err"] = float(np.max(np.abs(got - ref)))
            times = []
            for _ in range(5):
                t0 = time.perf_counter()
                np.asarray(fn())
                times.append(time.perf_counter() - t0)
            row["ms"] = round(float(min(times) * 1e3), 3)
        except Exception as e:
            row["compiled"] = False
            row["error"] = str(e).splitlines()[0][:200]
        print(json.dumps(row), flush=True)
        results["variants"].append(row)

    # transpose-free column/row-layout variant first (round 5 final attempt:
    # in-kernel transposes are the suspected Mosaic-crash op class)
    probe({"variant": "cr", "lanes": 128},
          lambda: sinkhorn_pallas_cr(p, q, D, n_iters=args.iters))

    for group, lanes in ((8, 128), (1, 128), (8, 64), (1, 64), (4, 128)):
        probe({"group": group, "lanes": lanes},
              lambda group=group, lanes=lanes: sinkhorn_pallas(
                  p, q, D, n_iters=args.iters, group=group, lanes=lanes))

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
