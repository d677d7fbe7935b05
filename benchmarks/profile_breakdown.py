"""Device-time attribution for the optimize-stage bench (VERDICT r2 item 3).

Answers, with measurements instead of attribution-by-folklore:
  1. what the tunnel costs per dispatch (trivial-op round trip),
  2. where one bench iteration's wall time goes (fused GAN step vs greedy
     decode vs val step — each timed dispatch-amortized),
  3. the top device-time HLO ops of the fused step, via a ``jax.profiler``
     trace parsed from the XPlane dump (best-effort: tunneled platforms may
     not export device planes; the component breakdown above still stands).

Writes one JSON to --out (default workdir/profile_breakdown.json).
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


def top_ops_from_trace(trace_fn, logdir: str, k: int = 8,
                       detail_opcodes=()):
    """Run ``trace_fn`` under a profiler trace and return the device-time
    breakdown (sync self-time + overlapped async DMA) from the XPlane dump.

    Uses the dependency-free wire-format reader in benchmarks/xplane.py —
    the canonical tensorboard_plugin_profile converters are pinned to a
    protobuf/TF version this image doesn't carry."""
    import jax

    from xplane import top_ops

    os.makedirs(logdir, exist_ok=True)
    with jax.profiler.trace(logdir):
        trace_fn()
    try:
        return top_ops(logdir, k=k, detail_opcodes=detail_opcodes)
    except Exception as e:  # malformed dump — keep the bench alive
        return {"error": f"{type(e).__name__}: {e}"}


def hlo_def_lines(hlo_text: str, op_names) -> dict:
    """Map profiled op names (e.g. 'copy.123') to their defining line in the
    optimized HLO — shape, operand, and (when XLA kept it) source metadata.
    This is what turns an opcode bucket into an attackable list."""
    import re

    out = {}
    for name in op_names:
        m = re.search(rf"^\s*%?{re.escape(name)} = .*$", hlo_text,
                      flags=re.MULTILINE)
        if m:
            line = m.group(0).strip()
            out[name] = line[:400] + ("..." if len(line) > 400 else "")
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(ROOT, "workdir",
                                                  "profile_breakdown.json"))
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--rng", default="threefry", choices=["threefry", "rbg"],
                    help="key impl for the TRACED/timed fused step (the "
                    "other impl is always timed as the comparison point)")
    ap.add_argument("--remat-scorers", action="store_true",
                    help="recompute the matcher/LM encoder layers in "
                    "backward (Config.remat_scorers) — A/B for the saved-"
                    "attention-probs copy bucket")
    ap.add_argument("--time-major", action="store_true",
                    help="keep the G-step's soft decode stacks time-major "
                    "(Config.time_major_probs) — A/B for the generator "
                    "scan-output transposes in the copy bucket")
    ap.add_argument("--fuse-gan", action="store_true",
                    help="reuse the G-step's fake decode for the D step "
                    "(Config.fuse_gan_steps) — A/B for the second rollout's "
                    "cost; changes D semantics vs the reference (D sees the "
                    "PRE-update G's decode), so opt-in only")
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
    from consistent__style_transfer_tpu.train.optimize import (
        OptimizeModels,
        make_optimize_steps,
    )
    from consistent__style_transfer_tpu.train.state import (
        TrainState,
        adam_with_clip,
    )

    res: dict = {"device": jax.devices()[0].device_kind,
                 "dtype": args.dtype, "batch": args.batch}

    # 1. dispatch round-trip latency (the tunnel tax on every host sync)
    one = jnp.ones((8,), jnp.float32)
    tiny = jax.jit(lambda x: x + 1)
    float(tiny(one)[0])
    lat = []
    for _ in range(30):
        t0 = time.time()
        float(tiny(one)[0])
        lat.append(time.time() - t0)
    lat.sort()
    res["dispatch_roundtrip_ms_p50"] = round(lat[len(lat) // 2] * 1e3, 2)
    res["dispatch_roundtrip_ms_min"] = round(lat[0] * 1e3, 2)

    # 2. component breakdown at bench shapes
    V, B = 10000, args.batch
    cfg = make_config("yelp")
    cfg.dtype = args.dtype
    cfg.remat_scorers = args.remat_scorers
    res["remat_scorers"] = args.remat_scorers
    cfg.fuse_gan_steps = args.fuse_gan
    res["fuse_gan_steps"] = args.fuse_gan
    cfg.time_major_probs = args.time_major
    res["time_major_probs"] = args.time_major
    mesh = make_mesh(len(jax.devices()), 1)
    models = OptimizeModels(cfg, V)
    key = jax.random.PRNGKey(0)
    L = cfg.max_len
    x0 = jnp.zeros((2, L), jnp.int32)
    l0 = jnp.zeros((2,), jnp.int32)
    n0 = jnp.zeros((2, L + L // 2), jnp.int32)
    kg, kc, km, kn, kd = jax.random.split(key, 5)
    g_params = replicate(
        models.generator.init(kg, x0, l0, None, l0, deterministic=True), mesh)
    frozen = replicate({
        "cls": models.classifier.init(kc, x0),
        "mat": models.matcher.init(km, n0, n0),
        "nt": models.nt_checker.init(kn, x0),
    }, mesh)
    d_params = replicate(models.disc.init(kd, x0), mesh)
    g_state = TrainState.create(
        g_params, adam_with_clip(cfg.optimize_lr, cfg.optimize_clip))
    d_state = TrainState.create(
        d_params, adam_with_clip(cfg.optimize_lr, cfg.optimize_clip))
    steps = make_optimize_steps(cfg, models)

    @jax.jit
    def decode(params, x, labels):
        return models.generator.apply(params, x, labels, None, 1 - labels,
                                      mode="greedy", deterministic=True)

    rng = np.random.default_rng(0)
    batch = shard_batch({
        "x": rng.integers(0, V, (B, L)).astype(np.int32),
        "labels": rng.integers(0, 2, (B,)).astype(np.int32),
    }, mesh)
    acc0 = jax.tree.map(jnp.zeros_like, d_state.params)
    bk = (jax.random.PRNGKey(1) if args.rng == "threefry"
          else jax.random.key(1, impl="rbg"))
    db = jax.random.fold_in(bk, 1)
    res["rng"] = args.rng

    def fetch(tree):
        leaf = jax.tree.leaves(tree)[0]
        float(jnp.asarray(leaf).ravel()[0])

    # AOT-compile the fused step ONCE and reuse the executable for the
    # timing loop, the trace capture, and the optimized-HLO text below —
    # a second .lower().compile() for the HLO used to double the wall of
    # every profile run on this tunneled chip (~37 s compiles)
    fused_exec = steps.fused_step.lower(
        g_state, d_state, acc0, frozen, batch, bk, db, 0,
        do_apply=True).compile()

    t_fused = _timeit(
        lambda: fused_exec(g_state, d_state, acc0, frozen, batch, bk, db, 0),
        fetch, iters=args.iters)
    t_decode = _timeit(
        lambda: decode(g_state.params, batch["x"], batch["labels"]),
        fetch, iters=args.iters)
    t_val = _timeit(
        lambda: steps.val_step(g_state.params, frozen, batch),
        fetch, iters=args.iters)
    res["fused_step_ms"] = round(t_fused * 1e3, 2)
    res["greedy_decode_ms"] = round(t_decode * 1e3, 2)
    res["val_step_ms"] = round(t_val * 1e3, 2)
    res["iter_ms"] = round((t_fused + t_decode) * 1e3, 2)
    res["bench_equiv_sent_per_s"] = round(B / (t_fused + t_decode), 1)

    # 2b. the OTHER key impl as comparison (Config.rng_impl): isolates the
    # cost of threefry dropout/ST-sampling mask generation in the GAN step
    other = "rbg" if args.rng == "threefry" else "threefry"
    bk_o = (jax.random.PRNGKey(1) if other == "threefry"
            else jax.random.key(1, impl="rbg"))
    db_o = jax.random.fold_in(bk_o, 1)
    t_fused_o = _timeit(
        lambda: steps.fused_step(g_state, d_state, acc0, frozen, batch,
                                 bk_o, db_o, 0, do_apply=True),
        fetch, iters=args.iters)
    res[f"fused_step_ms_{other}"] = round(t_fused_o * 1e3, 2)

    # 3. top device-time ops of the fused step (best-effort), with per-op
    # drill-down in the two named residual buckets (VERDICT r3 item 2)
    def run_fused():
        out = fused_exec(g_state, d_state, acc0, frozen, batch, bk, db, 0)
        jax.block_until_ready(out)

    detail = ("copy", "convert_reduce_fusion")
    res["top_ops"] = top_ops_from_trace(
        run_fused, os.path.join(ROOT, "workdir", "profile_trace"),
        detail_opcodes=detail)

    # 3b. map the drilled-down op names to their optimized-HLO definitions
    try:
        hlo = fused_exec.as_text()
        names = [d["op"]
                 for oc in (res["top_ops"].get("sync", {})
                            .get("opcode_detail", {}) or {}).values()
                 for d in oc]
        res["hlo_defs"] = hlo_def_lines(hlo, names)
    except Exception as e:
        res["hlo_defs"] = {"error": f"{type(e).__name__}: {e}"}

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(res, f, indent=2)
    print(json.dumps(res, indent=2))


if __name__ == "__main__":
    main()
