"""Optimize stage: adversarial style-transfer fine-tuning of the generator
(reference ``src/main_optimize.py``).

Faithful semantics:
- loads frozen pretrain scorers (cls/mat/dn) + the warmup generator
  (``main_optimize.py:33-54``);
- two Adam(1e-5) optimizers behind clip 1.0: G applies every batch, D
  *accumulates* gradients across 4 consecutive batches and applies on
  ``batch_idx % 4 == 0`` (PL zero_grads only on step — ``main_optimize.py:78-88``);
- G step (``:96-113``): differentiable straight-through decode sample_p =
  G(x, src, None, 1-src, "softmax", tau); losses s=CE(cls(sample_p), 1-src),
  c=MSE(mat(sample_p, x), gap), adv=BCE(D(sample_p), 1) with D in eval mode,
  bk=CE(G(argmax(sample_p), 1-src, teacher=x, src), x); total =
  w_bt*bk + w_c*c + w_adv*adv + w_s*s. The frozen cls/mat run in *train* mode
  (dropout active) exactly like the reference (PL train mode, only
  ``self.disc.eval()`` is explicit);
- D step (``:115-124``): real = D(x) (an embedding gather — math-identical to
  the reference's (B, L, V) one-hot matmul), fake = D(stop_grad(st decode));
  loss = w_adv * 0.5 * (BCE(real, 1) + BCE(fake, 0));
- validation (``:127-141``): tokens = argmax(st decode, eval mode); val_loss =
  CE(cls(tokens), 1-src) + CE(LM(tokens), tokens) + mean(mat(tokens, x));
  best-G checkpoint ``G_epoch_<n>`` with previous-best deletion, early stop
  patience 3;
- test mode (``:157-174, 243-255``): newest G_epoch_* (else warmup G), greedy
  transfer of train+test splits to ``.tsf`` files.

TPU shape: two jitted steps (G-update, D-grads) + one jitted apply for the
accumulated D update; both rollouts (transfer + back-translation) are scans
inside one XLA program, so a whole G step is a single device launch.
"""

from __future__ import annotations

import os
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..config import Config
from ..data.pipeline import MegaBatches, eval_arrays, make_batches
from ..data.prefetch import DevicePrefetcher
from ..ops.losses import (
    bce_with_logits,
    cross_entropy,
    masked_row_mean,
    mse,
    softmax_cross_entropy_tokens,
)
from ..parallel.sharding import replicate, shard_batch
from ..utils.io import RunLogger
from .common import (
    build_classifier,
    build_discriminator,
    build_generator,
    build_lm,
    build_matcher,
    get_corpus,
    get_mesh,
    get_tokenizer,
    make_key,
)
from .infer import run_inference
from .loop import EarlyStopper, Throughput
from .state import (
    AsyncSaver,
    BestKeeper,
    TrainState,
    adam_with_clip,
    load_params,
    newest_checkpoint,
    params_exist,
)


class OptimizeModels:
    def __init__(self, cfg: Config, n_vocab: int):
        self.generator = build_generator(cfg, n_vocab)
        self.classifier = build_classifier(cfg, n_vocab)
        self.matcher = build_matcher(cfg, n_vocab)
        self.nt_checker = build_lm(cfg, n_vocab)
        self.disc = build_discriminator(cfg, n_vocab)


def load_frozen(cfg: Config, models: OptimizeModels, key):
    """Frozen pretrain scorers; required like the reference (missing dumps are
    an error there too).

    Checkpoint templates are built with ``jax.eval_shape``: a real ``init``
    runs initializer-by-initializer on the device (tens of seconds of
    per-op round trips on a tunneled chip) only to be overwritten by the
    deserialized weights — the abstract tree carries the same structure at
    zero device cost."""
    pre = os.path.join(cfg.ds_dump_dir, "pretrain")
    B0, L0 = 2, cfg.max_len
    x0 = jnp.zeros((B0, L0), jnp.int32)
    n0 = jnp.zeros((B0, L0 + L0 // 2), jnp.int32)
    kc, km, kd = jax.random.split(key, 3)
    cls = load_params(os.path.join(pre, "cls.msgpack"),
                      jax.eval_shape(models.classifier.init, kc, x0))
    mat = load_params(os.path.join(pre, "mat.msgpack"),
                      jax.eval_shape(models.matcher.init, km, n0, n0))
    nt = load_params(os.path.join(pre, "dn.msgpack"),
                     jax.eval_shape(models.nt_checker.init, kd, x0))
    return {"cls": cls, "mat": mat, "nt": nt}


def load_generator_params(cfg: Config, models: OptimizeModels, key):
    """Train mode: warmup G if present (``main_optimize.py:44-46``); test
    mode: newest optimize checkpoint, else warmup G (``:47-54``)."""
    B0 = 2
    x0 = jnp.zeros((B0, cfg.max_len), jnp.int32)
    l0 = jnp.zeros((B0,), jnp.int32)
    from .warmup import warmup_ckpt_name

    # abstract template for checkpoint loads (a real init would replay every
    # initializer op-by-op through the device — ~80 s for the transformer
    # backbone on a tunneled chip); a REAL init happens only on the fresh
    # no-checkpoint fallback below
    template = jax.eval_shape(
        lambda: models.generator.init(key, x0, l0, None, l0,
                                      deterministic=True))
    task_dump = os.path.join(cfg.ds_dump_dir, f"optimize-{cfg.ver}")
    warm = os.path.join(cfg.ds_dump_dir, "warmup", warmup_ckpt_name(cfg))
    if cfg.mode == "test":
        newest = newest_checkpoint(task_dump)
        if newest:
            return load_params(newest, template)
        return load_params(warm, template)
    if params_exist(warm):
        return load_params(warm, template)
    return models.generator.init(key, x0, l0, None, l0, deterministic=True)


class OptimizeSteps(NamedTuple):
    """Jitted step functions for the optimize stage. ``fused_step`` is the
    production per-batch entry (ONE dispatch per batch: G update + D grads +
    accumulate + cond D apply, RNG folding inside the jit); the individual
    pieces remain for tests, the mesh exercise, and ablation of the fusion."""

    g_step: callable
    d_grads: callable
    d_grads_reuse: callable
    d_apply: callable
    accumulate: callable
    val_step: callable
    fused_step: callable
    megastep: callable  # k fused steps per dispatch (lax.scan over a stacked
    # (k, B, ...) super-batch) — the production loop when Config.megastep_k>1
    fused_step_dyn_fn: callable  # unjitted: callers jit it themselves
    # with out_shardings pinned (see its docstring) — no pre-jitted export,
    # because plain jit of this variant on an explicit mesh is the
    # double-compile footgun the docstring warns about


def make_optimize_steps(cfg: Config, models: OptimizeModels,
                        copy_weights=None) -> OptimizeSteps:
    """``copy_weights``: optional (V,) style-neutrality weights
    (``data/style_weights.py``) applied to the w_copy regularizer so copy
    pressure skips style-bearing tokens; None = uniform."""
    G, CLS, MAT, NT, D = (models.generator, models.classifier, models.matcher,
                          models.nt_checker, models.disc)
    if copy_weights is not None:
        copy_weights = jnp.asarray(copy_weights, jnp.float32)
    tau, gap = cfg.tau, cfg.gap
    w_s, w_c, w_adv, w_bt = cfg.w_s, cfg.w_c, cfg.w_adv, cfg.w_bt
    w_rec = cfg.w_rec
    w_copy = cfg.w_copy
    fuse_gan = cfg.fuse_gan_steps
    # time-major soft decode stacks (Config.time_major_probs): LSTM backbone
    # only — the transformer decodes batch-major natively, so the flag would
    # just move the transpose around
    tm = cfg.time_major_probs and cfg.backbone == "lstm"

    from .common import generator_call

    def st_decode(g_params, batch, rngs, deterministic, time_major=False):
        return generator_call(G, g_params, batch["x"], batch["labels"], None,
                              1 - batch["labels"], mode="st", tau=tau,
                              deterministic=deterministic, rngs=rngs,
                              time_major_out=time_major)

    def g_loss_fn(g_params, d_params, frozen, batch, rngs, copy_scale=1.0):
        # sample_p layout: (L, B, V) when tm else (B, L, V). Every consumer
        # below is layout-aware; the losses are means over B*L / argmaxes
        # over V, so the values are identical either way
        sample_p = st_decode(g_params, batch, rngs, deterministic=False,
                             time_major=tm)
        s_logits = CLS.apply(frozen["cls"], sample_p, deterministic=False,
                             rngs=rngs, time_major=tm)
        c_logits = MAT.apply(frozen["mat"], sample_p, batch["x"],
                             deterministic=False, rngs=rngs, time_major=tm)
        adv_logits = D.apply(d_params, sample_p, deterministic=True,
                             time_major=tm)
        bk_inp = jax.lax.stop_gradient(jnp.argmax(sample_p, -1))
        if tm:
            bk_inp = bk_inp.T  # (L, B) -> (B, L) ids: tiny int transpose
        bk_logits = generator_call(
            G, g_params, bk_inp,
            1 - batch["labels"], batch["x"], batch["labels"],
            mode="sched", deterministic=False, rngs=rngs, time_major_out=tm,
        )
        s_loss = cross_entropy(s_logits, 1 - batch["labels"])
        c_loss = mse(c_logits, jnp.full_like(c_logits, gap))
        adv_loss = bce_with_logits(adv_logits, jnp.ones_like(adv_logits))
        # CE mean over B*L is transpose-invariant: time-major logits pair
        # with time-major targets
        bk_tgt = batch["x"].T if tm else batch["x"]
        bk_loss = softmax_cross_entropy_tokens(bk_logits, bk_tgt)
        total = w_bt * bk_loss + w_c * c_loss + w_adv * adv_loss + w_s * s_loss
        aux = {"G": adv_loss, "STI": s_loss, "CP": jnp.mean(c_logits),
               "BK": bk_loss}
        if w_rec > 0:
            # copy bias (Config.w_rec): same-style teacher-forced
            # reconstruction CE — anchors the generator to its input
            # content while the 4 reference losses push the transfer
            rec_logits = generator_call(
                G, g_params, batch["x"], batch["labels"], batch["x"],
                batch["labels"], mode="sched", deterministic=False,
                rngs=rngs, time_major_out=tm)
            rec_tgt = batch["x"].T if tm else batch["x"]
            rec_loss = softmax_cross_entropy_tokens(rec_logits, rec_tgt)
            total = total + w_rec * rec_loss
            aux["REC"] = rec_loss
        if w_copy > 0:
            # copy regularization (Config.w_copy): NLL of the SOURCE
            # tokens under the free-running transfer distribution
            # sample_p (soft temperature-softmax probs; the ST hard
            # sample only feeds the decoder input). Unlike w_rec this
            # penalizes the transfer decode itself for drifting off the
            # source content; the style CE still dominates at the
            # style-word positions. Same no-mask mean-over-B*L
            # convention as the reference losses.
            # time axis is 0 when tm, 1 otherwise; src mirrors the layout so
            # the gathered grid (and every mean over it) is identical
            t_ax = 0 if tm else 1
            L = min(sample_p.shape[t_ax], batch["x"].shape[1])
            src = batch["x"][:, :L].T if tm else batch["x"][:, :L]
            p_src = jnp.take_along_axis(
                sample_p[:L] if tm else sample_p[:, :L],
                src[:, :, None], axis=-1)[..., 0]
            nll = -jnp.log(p_src + 1e-9)
            if copy_weights is None:
                copy_loss = jnp.mean(nll)
            else:
                # style-aware masking: weight each position by the source
                # token's style-neutrality so copy pressure leaves the
                # style-bearing positions to the style CE
                w = copy_weights[src]
                copy_loss = jnp.sum(w * nll) / jnp.maximum(jnp.sum(w), 1e-6)
            total = total + w_copy * copy_scale * copy_loss
            aux["COPY"] = copy_loss
        aux["loss"] = total
        return total, (aux, sample_p)

    @jax.jit
    def g_step(g_state: TrainState, d_params, frozen, batch, rngs):
        """Returns (new state, aux metrics, stop-gradient fake decode). The
        fake decode is reusable by the D step when Config.fuse_gan_steps is
        on (saves a third rollout per batch; the reference recomputes it)."""
        (_, (aux, sample_p)), grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(g_state.params, d_params, frozen, batch,
                                     rngs)
        return (g_state.apply_gradients(grads), aux,
                jax.lax.stop_gradient(sample_p))

    def _d_loss_fn(dp, fake_p, batch, rngs):
        # fake_p carries the G-step's layout ((L, B, V) when tm); the real
        # side is always batch-major ids
        t_logits = D.apply(dp, batch["x"], deterministic=False, rngs=rngs)
        f_logits = D.apply(dp, fake_p, deterministic=False, rngs=rngs,
                           time_major=tm)
        d_loss = 0.5 * (
            bce_with_logits(t_logits, jnp.ones_like(t_logits))
            + bce_with_logits(f_logits, jnp.zeros_like(f_logits))
        )
        return w_adv * d_loss

    @jax.jit
    def d_grads(d_params, g_params, batch, rngs):
        """Faithful D step: fresh no-grad fake decode (main_optimize.py:118-119)."""
        fake_p = jax.lax.stop_gradient(
            st_decode(g_params, batch, rngs, deterministic=False,
                      time_major=tm)
        )
        loss, grads = jax.value_and_grad(_d_loss_fn)(d_params, fake_p, batch, rngs)
        return grads, loss

    @jax.jit
    def d_grads_reuse(d_params, fake_p, batch, rngs):
        """Fused variant: reuse the G-step's fake decode (Config.fuse_gan_steps)."""
        loss, grads = jax.value_and_grad(_d_loss_fn)(d_params, fake_p, batch, rngs)
        return grads, loss

    @jax.jit
    def d_apply(d_state: TrainState, acc_grads):
        return d_state.apply_gradients(acc_grads)

    @jax.jit
    def accumulate(acc, grads):
        return jax.tree.map(jnp.add, acc, grads)

    @jax.jit
    def val_step(g_params, frozen, batch):
        # optional "row_mask" (data/pipeline.py::eval_arrays) keeps padded
        # duplicate rows out of every mean (absent => plain means)
        rows = batch.get("row_mask")
        sample_p = st_decode(g_params, batch, None, deterministic=True)
        tokens = jnp.argmax(sample_p, -1)
        s_logits = CLS.apply(frozen["cls"], tokens, deterministic=True)
        c_logits = MAT.apply(frozen["mat"], tokens, batch["x"], deterministic=True)
        nt_logits = NT.apply(frozen["nt"], tokens, deterministic=True)
        s_loss = cross_entropy(s_logits, 1 - batch["labels"], mask=rows)
        nt_loss = softmax_cross_entropy_tokens(nt_logits, tokens, row_mask=rows)
        c_mean = jnp.mean(c_logits) if rows is None else masked_row_mean(c_logits, rows)
        return nt_loss + s_loss + c_mean

    def _mk_rngs(base_key, step):
        # exact reproduction of train.common.step_rngs, traced inside the jit
        key = jax.random.fold_in(base_key, step)
        ks = jax.random.split(key, 2)
        return {"dropout": ks[0], "coin": ks[1]}

    def _fused_core(g_state: TrainState, d_state: TrainState, acc, frozen,
                    batch, base_key, d_base, step, copy_scale):
        """Shared body of the fused per-batch step: G update, D grads (fresh
        decode or reuse per Config.fuse_gan_steps), grad accumulation.
        Semantics identical to calling the individual steps in the reference
        order (G first, then D against the UPDATED generator,
        ``main_optimize.py:78-88``); RNG derivation matches
        ``step_rngs(key, step)`` / ``step_rngs(fold_in(key, 1), step)``
        exactly, so training trajectories are unchanged."""
        g_rngs = _mk_rngs(base_key, step)
        (_, (aux, sample_p)), grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(g_state.params, d_state.params, frozen,
                                     batch, g_rngs, copy_scale)
        g_state = g_state.apply_gradients(grads)
        d_rngs = _mk_rngs(d_base, step)
        if fuse_gan:
            fake_p = jax.lax.stop_gradient(sample_p)
        else:
            fake_p = jax.lax.stop_gradient(
                st_decode(g_state.params, batch, d_rngs, deterministic=False,
                          time_major=tm))
        d_loss, dgrads = jax.value_and_grad(_d_loss_fn)(
            d_state.params, fake_p, batch, d_rngs)
        acc = jax.tree.map(jnp.add, acc, dgrads)
        return g_state, d_state, acc, aux, d_loss

    @partial(jax.jit, static_argnames=("do_apply",))
    def fused_step(g_state: TrainState, d_state: TrainState, acc, frozen,
                   batch, base_key, d_base, step, do_apply: bool,
                   copy_scale=1.0):
        """One dispatch per training batch (production path): ``_fused_core``
        plus — when ``do_apply`` (every Config.d_update_every-th batch) — the
        D apply + accumulator reset, branch-specialized at compile time.
        Dispatch count per batch drops ~10x -> ~1x, which matters on hosts
        where per-dispatch latency is high (e.g. tunneled devices)."""
        g_state, d_state, acc, aux, d_loss = _fused_core(
            g_state, d_state, acc, frozen, batch, base_key, d_base, step,
            copy_scale)
        if do_apply:
            d_state = d_state.apply_gradients(acc)
            acc = jax.tree.map(jnp.zeros_like, acc)
        return g_state, d_state, acc, aux, d_loss

    @jax.jit
    def megastep(g_state: TrainState, d_state: TrainState, acc, frozen,
                 batches, base_key, d_base, step0, idx0, copy_scale=1.0):
        """k fused per-batch steps in ONE device dispatch: ``lax.scan`` over
        the stacked (k, B, ...) super-batch, body = ``_fused_core`` + a
        ``lax.cond``-traced D apply on the reference cadence
        (``(idx0 + i) % d_update_every == 0`` — epoch-local batch index, like
        ``main_optimize.py:85-88``). RNG streams use the ABSOLUTE step index
        ``step0 + i`` through the same ``_mk_rngs`` derivation, so the
        training trajectory is bit-identical to k calls of ``fused_step``
        (tests/test_megastep.py). The point: on hosts where per-dispatch
        latency is high (this repo's tunneled chip: ~33 ms round-trip,
        RESULTS.md round 3), dispatch overhead amortizes k-fold — the last
        attributed gap between benched and sustained throughput.

        Returns stacked (k,) aux/d_loss so callers can log per-batch values.
        """
        k = batches["x"].shape[0]

        def body(carry, inp):
            g_s, d_s, a = carry
            batch, step, do_apply = inp
            g_s, d_s, a, aux, d_loss = _fused_core(
                g_s, d_s, a, frozen, batch, base_key, d_base, step,
                copy_scale)
            d_s, a = jax.lax.cond(
                do_apply,
                lambda ds, ac: (ds.apply_gradients(ac),
                                jax.tree.map(jnp.zeros_like, ac)),
                lambda ds, ac: (ds, ac),
                d_s, a)
            return (g_s, d_s, a), (aux, d_loss)

        steps_i = step0 + jnp.arange(k)
        do_apply = ((idx0 + jnp.arange(k)) % cfg.d_update_every) == 0
        (g_state, d_state, acc), (aux, d_loss) = jax.lax.scan(
            body, (g_state, d_state, acc), (batches, steps_i, do_apply))
        return g_state, d_state, acc, aux, d_loss

    def fused_step_dyn_fn(g_state: TrainState, d_state: TrainState, acc,
                          frozen, batch, base_key, d_base, step, do_apply,
                          copy_scale=1.0):
        """``fused_step`` with ``do_apply`` TRACED (lax.cond) instead of
        static: ONE compilation covers both the accumulate-only and the
        apply batches. Used where compile time dominates run time — the
        driver's multichip gate and CI — at the cost of carrying the Adam
        update in-graph every batch (negligible next to the GAN rollouts,
        but the production loop keeps the branch-specialized variant).

        Exported UNJITTED only: on an explicit mesh the caller must jit it
        with ``out_shardings`` pinned to the input layout — otherwise XLA's
        sharding propagation re-lays-out the returned D-grad accumulator
        (model-sharded via the generator's TP vocab head), and the next
        call's changed input shardings force a SECOND full compile
        (measured 37 s each in the driver gate)."""
        g_state, d_state, acc, aux, d_loss = _fused_core(
            g_state, d_state, acc, frozen, batch, base_key, d_base, step,
            copy_scale)
        d_state, acc = jax.lax.cond(
            do_apply,
            lambda ds, a: (ds.apply_gradients(a),
                           jax.tree.map(jnp.zeros_like, a)),
            lambda ds, a: (ds, a),
            d_state, acc)
        return g_state, d_state, acc, aux, d_loss

    return OptimizeSteps(g_step, d_grads, d_grads_reuse, d_apply, accumulate,
                         val_step, fused_step, megastep, fused_step_dyn_fn)


def run_optimize(cfg: Config, progress: bool = True,
                 stats: list | None = None) -> str | None:
    """Train mode; returns path of the best G checkpoint (None if never
    improved — reference keeps no checkpoint in that case either).

    When ``stats`` is a list, one dict per epoch is appended with the
    epoch's sustained sentences/sec over the REAL pipeline (host batching +
    prefetch + G/D steps + validation), measured at the post-validation
    host fetch so queued device work cannot be miscounted as done."""
    tokenizer = get_tokenizer(cfg)
    mesh = get_mesh(cfg)
    V = len(tokenizer)
    models = OptimizeModels(cfg, V)
    key = make_key(cfg)
    frozen = replicate(load_frozen(cfg, models, key), mesh)
    g_params = replicate(load_generator_params(cfg, models, key), mesh)

    kd = jax.random.fold_in(key, 99)
    x0 = jnp.zeros((2, cfg.max_len), jnp.int32)
    d_params = replicate(models.disc.init(kd, x0), mesh)

    g_state = TrainState.create(g_params, adam_with_clip(cfg.optimize_lr, cfg.optimize_clip))
    d_state = TrainState.create(d_params, adam_with_clip(cfg.optimize_lr, cfg.optimize_clip))

    task_dump = os.path.join(cfg.ds_dump_dir, f"optimize-{cfg.ver}")
    os.makedirs(task_dump, exist_ok=True)

    train_corpus = get_corpus(cfg, "train", tokenizer)
    dev_corpus = get_corpus(cfg, "dev", tokenizer)
    train_it = make_batches(train_corpus, cfg.batch_size, cfg.max_len, "optimize",
                            shuffle=True, seed=cfg.seed)
    dev_it = make_batches(dev_corpus, cfg.batch_size, cfg.max_len, "optimize",
                          shuffle=False, seed=cfg.seed)

    copy_weights = None
    if cfg.w_copy > 0 and cfg.copy_mask:
        from ..data.style_weights import style_neutrality_weights

        copy_weights = style_neutrality_weights(train_corpus, V)
    steps = make_optimize_steps(cfg, models, copy_weights=copy_weights)
    fused_step, val_step = steps.fused_step, steps.val_step
    logger = RunLogger(f"{cfg.log_dir}/{cfg.dataset}", "optimize", cfg.ver, config=cfg)
    stopper = EarlyStopper(cfg.optimize_patience)
    # best-G save + previous-best delete run on a worker thread, overlapped
    # with the next epoch's dispatches (the reference's torch.save sits on
    # the epoch-end critical path, main_optimize.py:144-151)
    saver = AsyncSaver()
    keeper = BestKeeper("min", saver=saver)
    thru = Throughput()

    # full-state resume (params + both Adam states + epoch + best-val) — a
    # capability the reference lacks (its --restore_version only re-attaches
    # the logger, src/arguments.py:35)
    ckpt = None
    start_epoch = 0
    if cfg.resume:
        from .checkpoint import StateCheckpointer

        ckpt = StateCheckpointer(os.path.join(task_dump, "full_state"))
        template = {
            "g_params": g_state.params, "g_opt": g_state.opt_state,
            "d_params": d_state.params, "d_opt": d_state.opt_state,
            "epoch": 0, "best": float("inf"),
        }
        restored = ckpt.restore(template)
        if restored is not None:
            g_state = g_state.replace(params=restored["g_params"],
                                      opt_state=restored["g_opt"])
            d_state = d_state.replace(params=restored["d_params"],
                                      opt_state=restored["d_opt"])
            start_epoch = int(restored["epoch"]) + 1
            keeper.best = float(restored["best"])
            stopper.best = keeper.best

    acc = jax.tree.map(jnp.zeros_like, d_state.params)
    d_base = jax.random.fold_in(key, 1)
    mega_k = max(1, cfg.megastep_k)
    step = 0
    for epoch in range(start_epoch, cfg.epochs):
        ep_thru = Throughput()
        copy_scale = cfg.w_copy_decay ** epoch  # 1.0 unless decay configured
        if mega_k > 1:
            # production fast path: ONE dispatch per k batches (trajectory-
            # identical to the per-batch loop — tests/test_megastep.py)
            from ..parallel.sharding import shard_stacked_batch

            batch_idx = 0
            for _, arrays in DevicePrefetcher(
                    MegaBatches(train_it, mega_k), mesh,
                    shard_fn=shard_stacked_batch):
                kk = int(arrays["x"].shape[0])
                g_state, d_state, acc, auxs, d_losses = steps.megastep(
                    g_state, d_state, acc, frozen, arrays, key, d_base,
                    step, batch_idx, copy_scale)
                thru.add(kk * cfg.batch_size)
                ep_thru.add(kk * cfg.batch_size)
                if (step // 20) != ((step + kk) // 20):
                    # same ~every-20-batches cadence; device-side window
                    # means, one fetch per log
                    logger.log(step + kk - 1, D=jnp.mean(d_losses),
                               **{k: jnp.mean(v) for k, v in auxs.items()},
                               **thru.rates())
                step += kk
                batch_idx += kk
        else:
            for batch_idx, (batch, arrays) in enumerate(DevicePrefetcher(train_it, mesh)):
                g_state, d_state, acc, aux, d_loss = fused_step(
                    g_state, d_state, acc, frozen, arrays, key, d_base, step,
                    do_apply=(batch_idx % cfg.d_update_every == 0),
                    copy_scale=copy_scale)
                thru.add(cfg.batch_size)
                ep_thru.add(cfg.batch_size)
                if step % 20 == 0:
                    logger.log(step, D=d_loss, **aux, **thru.rates())
                step += 1

        # validation + best-G retention (main_optimize.py:127-151); losses
        # stay on device until ONE fetch at the end — per-batch float()
        # fetches would serialize a dispatch round-trip per dev batch
        totals, weight = [], 0
        for batch in dev_it:
            loss = val_step(g_state.params, frozen,
                            shard_batch(eval_arrays(batch), mesh))
            totals.append(loss * batch.valid)
            weight += batch.valid
        val_loss = (float(jnp.sum(jnp.stack(totals))) / max(weight, 1)
                    if totals else 0.0)
        # the float() fetch above forced completion of all queued work, so
        # the epoch rate (train batches / wall incl. validation) is honest
        if stats is not None:
            stats.append({"epoch": epoch, "sentences": ep_thru.sentences,
                          **ep_thru.rates()})
        logger.log(step, val_loss=val_loss, epoch=epoch)
        if progress:
            print(f"[optimize] epoch {epoch} val_loss {val_loss:.4f} "
                  f"{thru.rates()['sentences_per_sec']:.1f} sent/s")
        keeper.update(val_loss, g_state.params,
                      os.path.join(task_dump, f"G_epoch_{epoch}.msgpack"),
                      delete_previous=True)
        if ckpt is not None:
            ckpt.save(epoch, {
                "g_params": g_state.params, "g_opt": g_state.opt_state,
                "d_params": d_state.params, "d_opt": d_state.opt_state,
                "epoch": epoch, "best": keeper.best,
            })
        if stopper.update(val_loss):
            break

    saver.close()  # drain pending best-G writes (+ re-raise worker errors)
    # BEFORE the caller loads keeper.last_path (run_test / dress rehearsals)
    if ckpt is not None:
        ckpt.close()
    logger.close()
    return keeper.last_path


def run_test(cfg: Config) -> list[str]:
    """Test mode: transfer train+test splits to .tsf files."""
    tokenizer = get_tokenizer(cfg)
    models = OptimizeModels(cfg, len(tokenizer))
    key = make_key(cfg)
    g_params = load_generator_params(cfg, models, key)
    return run_inference(cfg, models.generator, g_params, tokenizer)
