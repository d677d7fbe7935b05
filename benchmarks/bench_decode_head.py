"""Settle the Pallas decode-head question with data (VERDICT r1 item 5).

Times the fused Pallas head (kernels/decode_step.py) against the plain XLA
reference at the yelp shape (V=10k) and the large-vocab regimes the kernel
was designed for (V=32k/50k, transformer-backbone vocabularies), in f32 and
bf16. The head computes argmax_v(LeakyReLU(x@W1+b1) @ W2) — bandwidth-bound
on streaming W2 and the (B, V) logits; the kernel avoids materializing the
logits in HBM.

Usage: python benchmarks/bench_decode_head.py [--out workdir/decode_head.json]
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


def timeit(fn, x, w1, b1, w2, inner: int = 100, reps: int = 5) -> float:
    """ms per head call. The device tunnel here adds ~100 ms per dispatch, so
    a single call measures the tunnel, not the kernel: chain `inner`
    data-dependent calls inside one jit (h feeds back into x so nothing is
    DCE'd or overlapped) and fetch once; report the best of `reps`."""

    @jax.jit
    def loop(x0):
        def body(x, _):
            ids, h = fn(x, w1, b1, w2)
            nxt = x0 + 1e-6 * jnp.concatenate([h, h], -1).astype(x0.dtype)
            return nxt, ids[0]
        _, ids = jax.lax.scan(body, x0, None, length=inner)
        return ids

    np.asarray(loop(x))  # compile + warm
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(loop(x))
        times.append(time.perf_counter() - t0)
    return float((min(times) * 1e3) / inner)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="workdir/decode_head.json")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()

    from consistent__style_transfer_tpu.kernels.decode_step import (
        decode_head_reference,
        fused_decode_logits,
    )

    B, DIN, H = args.batch, 1024, 512
    key = jax.random.PRNGKey(0)
    rows = []
    for V in (10000, 32000, 50257):
        for dtype in (jnp.float32, jnp.bfloat16):
            kx, k1, k2 = jax.random.split(jax.random.fold_in(key, V), 3)
            x = jax.random.normal(kx, (B, DIN), dtype)
            w1 = jax.random.normal(k1, (DIN, H), dtype) * 0.02
            b1 = jnp.zeros((H,), jnp.float32)
            w2 = jax.random.normal(k2, (H, V), dtype) * 0.02

            ref = jax.jit(decode_head_reference)
            t_ref = timeit(decode_head_reference, x, w1, b1, w2)
            ids_ref, _ = ref(x, w1, b1, w2)

            t_pal = None
            match = None
            try:
                t_pal = timeit(fused_decode_logits, x, w1, b1, w2)
                ids_pal, _ = fused_decode_logits(x, w1, b1, w2)
                match = float(np.mean(np.asarray(ids_pal) == np.asarray(ids_ref)))
            except Exception as e:  # pragma: no cover - env-dependent
                print(f"pallas failed at V={V} {dtype.__name__}: {e}")

            row = {
                "V": V,
                "dtype": dtype.__name__,
                "xla_ms": round(t_ref, 4),
                "pallas_ms": round(t_pal, 4) if t_pal is not None else None,
                "argmax_agreement": match,
                "speedup": round(t_ref / t_pal, 3) if t_pal else None,
            }
            rows.append(row)
            print(json.dumps(row), flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"batch": B, "din": DIN, "hidden": H, "rows": rows}, f,
                  indent=2)


if __name__ == "__main__":
    main()
