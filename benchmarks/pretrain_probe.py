"""Pretrain-step device-time attribution (round 3: pretrain sustains ~4.3k
sent/s vs optimize's ~5.5k — find out where the step time goes).

The pretrain ``train_step`` takes the per-task freeze flags as STATIC args
(each combo is its own XLA program), which gives per-tower attribution for
free: time the full step and each single-tower step dispatch-amortized,
fetch-forced (block_until_ready is unreliable through this host's tunnel).

Writes one JSON to --out.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def _timeit(fn, fetch, iters=20, warm=3):
    for _ in range(warm):
        r = fn()
    fetch(r)
    t0 = time.time()
    for _ in range(iters):
        r = fn()
    fetch(r)
    return (time.time() - t0) / iters


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(ROOT, "workdir",
                                                  "pretrain_probe.json"))
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from consistent__style_transfer_tpu.config import make_config
    from consistent__style_transfer_tpu.parallel.mesh import make_mesh
    from consistent__style_transfer_tpu.parallel.sharding import (
        replicate,
        shard_batch,
    )
    from consistent__style_transfer_tpu.train.common import (
        build_classifier,
        build_lm,
        build_matcher,
    )
    from consistent__style_transfer_tpu.train.pretrain import (
        make_pretrain_steps,
    )
    from consistent__style_transfer_tpu.train.state import (
        TrainState,
        adam_with_clip,
    )

    V, B = 10000, args.batch
    cfg = make_config("yelp")
    cfg.dtype = args.dtype
    L = cfg.max_len
    NL = L + L // 2
    mesh = make_mesh(len(jax.devices()), 1)
    models = {"cls": build_classifier(cfg, V), "mat": build_matcher(cfg, V),
              "dn": build_lm(cfg, V)}
    key = jax.random.PRNGKey(0)
    kc, km, kd = jax.random.split(key, 3)
    x0 = jnp.zeros((2, L), jnp.int32)
    n0 = jnp.zeros((2, NL), jnp.int32)
    params = replicate({
        "cls": models["cls"].init(kc, x0),
        "mat": models["mat"].init(km, n0, n0),
        "dn": models["dn"].init(kd, x0),
    }, mesh)
    state = TrainState.create(
        params, adam_with_clip(cfg.pretrain_lr, cfg.pretrain_clip))
    train_step, eval_step = make_pretrain_steps(models)

    rng = np.random.default_rng(0)
    batch = shard_batch({
        "x": rng.integers(0, V, (B, L)).astype(np.int32),
        "nx1": rng.integers(0, V, (B, NL)).astype(np.int32),
        "nx2": rng.integers(0, V, (B, NL)).astype(np.int32),
        "nx3": rng.integers(0, V, (B, L)).astype(np.int32),
        "labels": rng.integers(0, 2, (B,)).astype(np.int32),
        "wmd": rng.random(B).astype(np.float32),
    }, mesh)

    def force(r):
        st = r[0]
        float(jnp.asarray(jax.tree.leaves(st.params)[0]).ravel()[0])

    out = {"batch": B, "dtype": args.dtype,
           "device": getattr(jax.devices()[0], "device_kind", "?")}
    combos = {"full": (True, True, True), "cls_only": (True, False, False),
              "mat_only": (False, True, False), "dn_only": (False, False, True)}
    for name, flags in combos.items():
        dt = _timeit(lambda: train_step(state, batch, key, 0, flags), force)
        out[f"step_ms_{name}"] = round(dt * 1e3, 2)
        out[f"sent_per_s_{name}"] = round(B / dt, 1)

    # dropout-mask generation cost: same full step, keys from the TPU's
    # hardware RngBitGenerator instead of threefry (Config.rng_impl="rbg");
    # split/fold_in/bernoulli all follow the key's impl, so this isolates
    # the mask-generation opcode swap
    key_rbg = jax.random.key(0, impl="rbg")
    dt = _timeit(lambda: train_step(state, batch, key_rbg, 0,
                                    (True, True, True)), force)
    out["step_ms_full_rbg"] = round(dt * 1e3, 2)
    out["sent_per_s_full_rbg"] = round(B / dt, 1)
    # dispatch round-trip for reference
    trivial = jax.jit(lambda x: x + 1)
    dt = _timeit(lambda: trivial(jnp.float32(0)), lambda r: float(r))
    out["dispatch_ms"] = round(dt * 1e3, 2)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
