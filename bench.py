"""North-star benchmark: train + decode sentences/sec/chip on the optimize
workload at Yelp shapes (V=10000, L=18, B=256).

One iteration = one generator training step (straight-through GAN decode +
back-translation rollout + scorer losses + Adam update) + one discriminator
backward + one greedy decode of the batch — exactly the per-batch work of the
reference's optimize stage + test decode (see benchmarks/torch_cpu_reference.py
for the CPU baseline of the same workload).

Prints ONE json line:
  {"metric": ..., "value": N, "unit": "sentences/sec/chip", "vs_baseline": N}

Extra fields: ``mfu`` = analytic FLOPs/iter (XLA cost analysis) / measured
iter time / ``peak_flops_per_sec``, where the peak is the chip's DENSE bf16
figure from ``_peak_flops_per_s`` (v5e: 197e12 — the one MFU denominator
used everywhere, incl. RESULTS.md).
"""

from __future__ import annotations

import json
import os
import time

BASELINE_PATH = os.path.join(os.path.dirname(__file__), "benchmarks", "baseline_cpu.json")
# measured on this image's host CPU via benchmarks/torch_cpu_reference.py
# (fallback when the json is absent)
FALLBACK_BASELINE = 1.97


def measure_sustained() -> list[dict]:
    """Sustained throughput over the REAL optimize pipeline — corpus load,
    host batching + prefetch, G step, D grad accumulation + periodic apply,
    per-epoch validation, best-G checkpointing — on the synthetic yelp corpus
    (data/yelp, 16k sentences/style). Returns per-epoch stats; epoch 0
    carries the compiles, so the last epoch is the steady-state rate.

    Frozen scorers + warmup G are seeded with random inits through the
    production save/load path (throughput is weight-independent)."""
    import jax
    import jax.numpy as jnp

    from consistent__style_transfer_tpu.config import make_config
    from consistent__style_transfer_tpu.train.common import get_tokenizer
    from consistent__style_transfer_tpu.train.optimize import (
        OptimizeModels,
        run_optimize,
    )
    from consistent__style_transfer_tpu.train.state import save_params
    from consistent__style_transfer_tpu.train.warmup import warmup_ckpt_name

    root = os.path.dirname(os.path.abspath(__file__))
    work = os.path.join(root, "workdir", "bench_sustained")
    cfg = make_config(
        "yelp",
        data_dir=os.path.join(root, "data"),
        dump_dir=os.path.join(work, "dump"),
        log_dir=os.path.join(work, "log"),
        out_dir=os.path.join(work, "output"),
        epochs=2,
        ver="bench",
    )
    cfg.dtype = os.environ.get("TPUST_BENCH_DTYPE", "bfloat16")
    # megastep_k follows the shipped default (1). The round-5 A/B showed
    # k=8 is within noise of k=1 at this corpus size (7,504 vs 7,772
    # sent/s steady) because dispatches are async — the r4 sustained gap
    # was the SYNC epoch-end saves, fixed by AsyncSaver (RESULTS.md
    # "Sustained-vs-benched"). Env override kept for experiments.
    cfg.megastep_k = int(os.environ.get("TPUST_BENCH_MEGASTEP", "1"))
    if not os.path.exists(cfg.train_files()[0]):
        return []

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
    run_optimize(cfg, progress=False, stats=stats)
    return stats


def _peak_flops_per_s(device) -> float | None:
    """Dense peak FLOP/s (bf16 MXU) by device kind — the MFU denominator.
    Public figures: v4 275, v5e 197, v5p 459, v6e (Trillium) 918 TFLOP/s."""
    kind = getattr(device, "device_kind", "").lower()
    if "v5 lite" in kind or "v5e" in kind or "lite" in kind:
        return 197e12
    if "v5p" in kind or "v5" in kind:
        return 459e12
    if "v6" in kind:
        return 918e12
    if "v4" in kind:
        return 275e12
    return None


def _flops_of(lowerable, *args, **static) -> float | None:
    """XLA's own per-execution FLOP estimate for a jitted fn via the AOT
    path (lower -> compile -> cost_analysis). Returns None when the backend
    doesn't expose a cost model (e.g. some tunneled platforms)."""
    try:
        cost = lowerable.lower(*args, **static).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        f = float(cost.get("flops", 0.0))
        return f if f > 0 else None
    except Exception:
        return None


def _devices_with_retry(attempts: int = 2, wait_s: float = 90.0):
    """Bring up the JAX backend, retrying transient tunnel failures.

    The single TPU chip here is reached through a tunnel that can blip for
    minutes at a time (observed: backend init hanging ~30 min then raising
    UNAVAILABLE). The driver records this script's one JSON line as the
    round's bench — a transient blip must not turn into an empty record, so
    retry with a bounded backoff before giving up loudly. Two attempts
    only: during a real outage each attempt itself HANGS ~25 min inside
    backend init before raising, so more retries just stall the caller."""
    import time as _time

    import jax

    for attempt in range(attempts):
        try:
            devs = jax.devices()
            if (devs[0].platform == "cpu"
                    and os.environ.get("TPUST_BENCH_ALLOW_CPU") != "1"):
                # a CPU "bench" is a bogus record, not a benchmark
                raise SystemExit(
                    "bench: resolved to the CPU backend — refusing to record "
                    "a non-TPU number (set TPUST_BENCH_ALLOW_CPU=1 to force)")
            return devs
        except RuntimeError as e:  # xla_bridge raises RuntimeError on init
            if attempt == attempts - 1:
                raise
            print(f"bench: backend init failed (attempt {attempt + 1}/"
                  f"{attempts}): {e}; retrying in {wait_s:.0f}s",
                  file=__import__("sys").stderr, flush=True)
            _time.sleep(wait_s)


def _enable_xla_cache() -> None:
    """Persistent XLA compilation cache shared with __graft_entry__: the
    bench compiles the full fused GAN step + decode + sustained pipeline
    (~minutes cold on the tunneled chip); caching them makes repeat driver
    runs near-instant and keeps the benched numbers compile-free."""
    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "workdir", "xla_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from consistent__style_transfer_tpu.config import make_config
    from consistent__style_transfer_tpu.parallel.mesh import make_mesh
    from consistent__style_transfer_tpu.parallel.sharding import replicate, shard_batch
    from consistent__style_transfer_tpu.train.optimize import (
        OptimizeModels,
        make_optimize_steps,
    )
    from consistent__style_transfer_tpu.train.state import TrainState, adam_with_clip

    V, B = 10000, 256
    cfg = make_config("yelp")  # max_len=18, batch 256
    # bfloat16 is the bench default: measured quality-neutral on the full
    # pipeline (RESULTS.md bf16 A/B: cp_base vs cp_base_bf16 within noise on
    # all five metrics) and ~21% faster; TPUST_BENCH_DTYPE=float32 reverts
    cfg.dtype = os.environ.get("TPUST_BENCH_DTYPE", "bfloat16")
    # TPUST_BENCH_BACKBONE=transformer benches the stretch backbone
    # (BASELINE.json configs[4]) on the same workload
    cfg.backbone = os.environ.get("TPUST_BENCH_BACKBONE", cfg.backbone)
    if os.environ.get("TPUST_BENCH_BATCH"):
        B = int(os.environ["TPUST_BENCH_BATCH"])
    _enable_xla_cache()
    n_dev = len(_devices_with_retry())
    mesh = make_mesh(n_dev, 1)
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
    g_state = TrainState.create(g_params, adam_with_clip(cfg.optimize_lr, cfg.optimize_clip))
    d_state = TrainState.create(d_params, adam_with_clip(cfg.optimize_lr, cfg.optimize_clip))

    # TPUST_BENCH_FUSED=1 additionally reuses the G-step's fake decode for
    # the D step (Config.fuse_gan_steps); the fused single-dispatch batch
    # step is the production path either way (train/optimize.py fused_step)
    cfg.fuse_gan_steps = os.environ.get("TPUST_BENCH_FUSED", "0") == "1"
    steps = make_optimize_steps(cfg, models)

    import jax.numpy as jnp  # noqa: F811

    from consistent__style_transfer_tpu.train.common import generator_call

    @jax.jit
    def decode(params, x, labels):
        return generator_call(models.generator, params, x, labels, None,
                              1 - labels, mode="greedy", deterministic=True)

    rng = np.random.default_rng(0)
    batch = shard_batch({
        "x": rng.integers(0, V, (B, L)).astype(np.int32),
        "labels": rng.integers(0, 2, (B,)).astype(np.int32),
    }, mesh)
    from consistent__style_transfer_tpu.train.common import make_key

    # keys follow the production default (Config.rng_impl) so the bench
    # measures exactly what run_optimize dispatches
    bench_key = make_key(cfg, seed=1)
    d_base = jax.random.fold_in(bench_key, 1)
    acc0 = jax.tree.map(jnp.zeros_like, d_state.params)

    def one_iter(g_state, d_state, step):
        g_state, d_state, _, aux, d_loss = steps.fused_step(
            g_state, d_state, acc0, frozen, batch, bench_key, d_base, step,
            do_apply=True)
        toks = decode(g_state.params, batch["x"], batch["labels"])
        return g_state, d_state, toks

    def force(tree):
        # On tunneled platforms block_until_ready can return before the work
        # is done; a host fetch of one element per state is the only honest
        # completion barrier.
        for leaf in jax.tree.leaves(tree)[:1]:
            float(jnp.asarray(leaf).ravel()[0])

    # compile + warm: the first step also changes opt_state layouts (host
    # init -> device outputs), which triggers one more compile on step 2, so
    # warm until steady state before timing
    for i in range(3):
        g_state, d_state, toks = one_iter(g_state, d_state, i)
    force((g_state.params, d_state.params, toks))

    iters = 20
    t0 = time.time()
    for i in range(iters):
        g_state, d_state, toks = one_iter(g_state, d_state, 3 + i)
    force((g_state.params, d_state.params, toks))
    dt = time.time() - t0
    value = iters * B / dt / max(n_dev, 1)

    baseline = FALLBACK_BASELINE
    if os.path.exists(BASELINE_PATH):
        with open(BASELINE_PATH) as f:
            baseline = json.load(f)["sentences_per_sec"]

    out = {
        "metric": "Train + decode sentences/sec/chip at parity transfer-acc/BLEU (Yelp)",
        "value": round(value, 2),
        "unit": "sentences/sec/chip",
        "vs_baseline": round(value / baseline, 2),
    }

    # --- MFU: XLA-counted FLOPs of one iteration / measured time / peak ---
    # (VERDICT r2 item 3: absolute perf accounting, not a CPU-ratio strawman)
    f_fused = _flops_of(steps.fused_step, g_state, d_state, acc0, frozen,
                        batch, bench_key, d_base, 0, do_apply=True)
    f_decode = _flops_of(decode, g_state.params, batch["x"], batch["labels"])
    peak = _peak_flops_per_s(jax.devices()[0])
    if f_fused and f_decode:
        flops_iter = f_fused + f_decode
        out["flops_per_iter"] = flops_iter
        out["device_flops_per_sec"] = round(flops_iter * iters / dt, 3)
        if peak:
            out["mfu"] = round(flops_iter * iters / dt / peak, 5)
            out["peak_flops_per_sec"] = peak

    # sustained = real optimize pipeline (host batching + prefetch + G/D +
    # validation + checkpointing), steady-state epoch (VERDICT r1 item 4)
    if os.environ.get("TPUST_BENCH_SUSTAINED", "1") == "1":
        stats = measure_sustained()
        if stats:
            sustained = stats[-1]["sentences_per_sec"] / max(n_dev, 1)
            out["sustained_sentences_per_sec"] = round(sustained, 2)
            out["sustained_vs_baseline"] = round(sustained / baseline, 2)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
