"""Serving-latency benchmark: greedy transfer-decode latency per batch size.

The serve path (`cli.py::cmd_serve` -> `train/infer.py::make_transfer_step`)
compiles one greedy ids-emitting decode per batch shape; this measures its
end-to-end dispatch+compute+fetch latency (the fetch is the honest
completion barrier on tunneled devices — see bench.py) at interactive and
bulk batch sizes. Latency is weight-independent, so random params suffice.

Usage: python benchmarks/bench_serve.py [--vocab 10000] [--iters 50]
Writes one JSON line per batch size.
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
    ap.add_argument("--vocab", type=int, default=10000)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--batches", default="1,32,256")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from consistent__style_transfer_tpu.config import make_config
    from consistent__style_transfer_tpu.train.infer import make_transfer_step
    from consistent__style_transfer_tpu.train.optimize import OptimizeModels

    cfg = make_config("yelp")
    models = OptimizeModels(cfg, args.vocab)
    key = jax.random.PRNGKey(0)
    x0 = jnp.zeros((2, cfg.max_len), jnp.int32)
    l0 = jnp.zeros((2,), jnp.int32)
    params = models.generator.init(key, x0, l0, None, l0, deterministic=True)
    step = make_transfer_step(models.generator, cfg.beam_size)

    rng = np.random.default_rng(0)
    for B in (int(b) for b in args.batches.split(",")):
        x = rng.integers(3, args.vocab, (B, cfg.max_len)).astype(np.int32)
        labels = rng.integers(0, 2, (B,)).astype(np.int32)
        np.asarray(step(params, x, labels))  # compile
        lat = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            np.asarray(step(params, x, labels))  # fetch forces completion
            lat.append((time.perf_counter() - t0) * 1e3)
        lat.sort()
        p50 = lat[len(lat) // 2]
        p99 = lat[min(len(lat) - 1, int(len(lat) * 0.99))]
        print(json.dumps({
            "batch": B, "p50_ms": round(p50, 2), "p99_ms": round(p99, 2),
            "sentences_per_sec": round(B / (p50 / 1e3), 1),
        }), flush=True)


if __name__ == "__main__":
    main()
