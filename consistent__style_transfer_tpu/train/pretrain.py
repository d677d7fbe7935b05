"""Pretrain stage: jointly train the three frozen-later scoring models
(reference ``src/main_pretrain.py``):

- TextCNN style classifier — CE(cls(x), style label);
- PairMatcher — MSE(matcher(noise1, noise2), WMD label) on two independent
  transfer_noise(0.15) variants;
- TransformerLM denoiser — CE(LM(rand_perm(x)), x).

One Adam(1e-4) over all params behind a *joint* global-norm clip of 5.0
(``main_pretrain.py:61-64`` + trainer clip), summed losses
(``main_pretrain.py:66-77``). Per-task freeze-on-plateau
(``main_pretrain.py:92-110``): the first time a task's val loss worsens, its
flag flips off permanently — its tower is skipped (flags are static jit args,
so each flag combo is its own lean XLA program) and its best weights stay on
disk. val_loss for early stopping = sum of per-task bests, patience 1.

Unlike the reference (which unconditionally loads its own previous dumps at
startup — first-run crash, ``main_pretrain.py:33-37``), existing per-task
dumps are resumed from when present, else initialized fresh.
"""

from __future__ import annotations

import os
import time
from functools import partial

import jax
import jax.numpy as jnp

from ..config import Config
from ..data.pipeline import eval_arrays, make_batches
from ..data.prefetch import DevicePrefetcher
from ..data.wmd_labels import ExactWmdLabeler, SinkhornWmdLabeler
from ..ops.losses import cross_entropy, mse, softmax_cross_entropy_tokens
from ..parallel.sharding import replicate, shard_batch
from ..utils.io import RunLogger
from .common import (
    build_classifier,
    build_lm,
    build_matcher,
    get_corpus,
    get_mesh,
    get_tokenizer,
    make_key,
    get_w2v,
)
from .loop import EarlyStopper, Throughput
from .state import (
    AsyncSaver,
    TrainState,
    adam_with_clip,
    load_params,
    params_exist,
    save_params,
)

TASKS = ("cls", "mat", "dn")


def make_pretrain_steps(models: dict):
    cls_m, mat_m, dn_m = models["cls"], models["mat"], models["dn"]

    def losses(params, batch, rngs, flags, deterministic):
        # optional "row_mask" (data/pipeline.py::eval_arrays) keeps padded
        # duplicate rows out of the val means; absent on train batches
        rows = batch.get("row_mask")
        out = {}
        if flags[0]:
            s_logits = cls_m.apply(params["cls"], batch["x"],
                                   deterministic=deterministic, rngs=rngs)
            out["cls"] = cross_entropy(s_logits, batch["labels"], mask=rows)
        if flags[1]:
            c_logits = mat_m.apply(params["mat"], batch["nx1"], batch["nx2"],
                                   deterministic=deterministic, rngs=rngs)
            out["mat"] = mse(c_logits, batch["wmd"], mask=rows)
        if flags[2]:
            dn_logits = dn_m.apply(params["dn"], batch["nx3"],
                                   deterministic=deterministic, rngs=rngs)
            out["dn"] = softmax_cross_entropy_tokens(dn_logits, batch["x"],
                                                     row_mask=rows)
        return out

    @partial(jax.jit, static_argnames=("flags",))
    def train_step(state: TrainState, batch, base_key, step, flags):
        # RNG folding traced inside the jit (one dispatch per batch; exact
        # reproduction of step_rngs(key, step, ("dropout",)))
        rngs = {"dropout": jax.random.split(
            jax.random.fold_in(base_key, step), 1)[0]}

        def loss_fn(params):
            parts = losses(params, batch, rngs, flags, deterministic=False)
            total = sum(parts.values())
            return total, parts

        (_, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        return state.apply_gradients(grads), parts

    @partial(jax.jit, static_argnames=("flags",))
    def eval_step(params, batch, flags):
        return losses(params, batch, None, flags, deterministic=True)

    return train_step, eval_step


def run_pretrain(cfg: Config, progress: bool = True) -> dict[str, str]:
    """Returns {task: best checkpoint path}."""
    tokenizer = get_tokenizer(cfg)
    w2v = get_w2v(cfg, tokenizer)
    mesh = get_mesh(cfg)
    task_dump = os.path.join(cfg.ds_dump_dir, "pretrain")
    os.makedirs(task_dump, exist_ok=True)
    paths = {t: os.path.join(task_dump, f"{t}.msgpack") for t in TASKS}

    if cfg.sinkhorn_wmd:
        labeler = SinkhornWmdLabeler(w2v, tokenizer,
                                     max_atoms=cfg.max_len + cfg.max_len // 2)
    else:
        labeler = ExactWmdLabeler(w2v, tokenizer)

    train_corpus = get_corpus(cfg, "train", tokenizer)
    dev_corpus = get_corpus(cfg, "dev", tokenizer)
    # once freeze-on-plateau turns the matcher off, its collate inputs (two
    # transfer_noise variants + the per-batch device Sinkhorn WMD solve) are
    # dead weight for every remaining epoch — at 270k-sentences/style scale
    # the post-freeze majority of pretrain; both iterators skip them then
    flags = {t: True for t in TASKS}
    need_matcher = lambda: flags["mat"]  # noqa: E731
    train_it = make_batches(train_corpus, cfg.batch_size, cfg.max_len, "pretrain",
                            shuffle=True, seed=cfg.seed, wmd_labeler=labeler,
                            need_matcher=need_matcher)
    dev_it = make_batches(dev_corpus, cfg.batch_size, cfg.max_len, "pretrain",
                          shuffle=False, seed=cfg.seed, wmd_labeler=labeler,
                          need_matcher=need_matcher)

    V = len(tokenizer)
    models = {"cls": build_classifier(cfg, V), "mat": build_matcher(cfg, V),
              "dn": build_lm(cfg, V)}
    key = make_key(cfg)
    kc, km, kd = jax.random.split(key, 3)
    B0, L0 = 2, cfg.max_len
    x0 = jnp.zeros((B0, L0), jnp.int32)
    n0 = jnp.zeros((B0, L0 + L0 // 2), jnp.int32)
    params = {
        "cls": models["cls"].init(kc, x0),
        "mat": models["mat"].init(km, n0, n0),
        "dn": models["dn"].init(kd, x0),
    }
    for t in TASKS:  # resume from existing per-task dumps when present
        if params_exist(paths[t]):
            params[t] = load_params(paths[t], params[t])
    params = replicate(params, mesh)
    state = TrainState.create(params, adam_with_clip(cfg.pretrain_lr, cfg.pretrain_clip))

    train_step, eval_step = make_pretrain_steps(models)
    logger = RunLogger(f"{cfg.log_dir}/{cfg.dataset}", "pretrain", config=cfg)
    stopper = EarlyStopper(cfg.pretrain_patience)
    best = {t: float("inf") for t in TASKS}
    thru = Throughput()
    # per-task best saves run on a worker thread, overlapped with the next
    # epoch's dispatches (VERDICT r4 item 8; reference serializes three
    # torch.save calls at every improving epoch end, main_pretrain.py:92-110)
    saver = AsyncSaver()

    step = 0
    for epoch in range(cfg.epochs):
        ftuple = tuple(flags[t] for t in TASKS)
        if not any(ftuple):
            break
        ep_t0, ep_sent = time.time(), 0
        for batch, arrays in DevicePrefetcher(train_it, mesh):
            state, parts = train_step(state, arrays, key, step, ftuple)
            thru.add(cfg.batch_size)
            ep_sent += cfg.batch_size
            if step % 50 == 0:
                logger.log(step, **{f"{t}_loss": v for t, v in parts.items()},
                           **thru.rates())
            step += 1

        # validation epoch end: freeze-on-plateau per task. Per-task losses
        # stay ON DEVICE until one fetch per task after the loop — per-batch
        # float() fetches would serialize a dispatch round-trip per dev
        # batch (the tunnel's ~33 ms each; same fix as optimize's val loop)
        totals = {t: [] for t in TASKS}
        weights = 0
        for batch in dev_it:
            parts = eval_step(state.params, shard_batch(eval_arrays(batch), mesh),
                              ftuple)
            for t, v in parts.items():
                totals[t].append(v * batch.valid)
            weights += batch.valid
        val = {t: float(jnp.sum(jnp.stack(totals[t]))) / max(weights, 1)
               for t in TASKS if flags[t]}
        # the fetches above forced completion of all queued work, so the
        # epoch rate (train batches / wall incl. validation) is honest
        ep_rate = ep_sent / max(time.time() - ep_t0, 1e-6)
        for t in TASKS:
            if not flags[t]:
                continue
            if best[t] < val[t]:
                flags[t] = False  # permanent freeze (main_pretrain.py:100-102)
            else:
                best[t] = val[t]
                saver.submit(state.params[t], paths[t])
        val_loss = sum(v for v in best.values() if v != float("inf"))
        logger.log(step, val_loss=val_loss, epoch=epoch,
                   epoch_sent_per_s=ep_rate,
                   **{f"val_{t}": val.get(t, float("nan")) for t in TASKS})
        if progress:
            print(f"[pretrain] epoch {epoch} val_loss {val_loss:.4f} "
                  f"{ep_rate:.1f} sent/s flags {flags}")
        if stopper.update(val_loss):
            break

    saver.close()  # drain pending saves (+ re-raise worker errors) BEFORE
    # anything reads the dumps (warmup/optimize load them right after)
    for t in TASKS:  # guarantee artifacts even on a 1-epoch degenerate run
        if not os.path.exists(paths[t]):
            save_params(jax.device_get(state.params[t]), paths[t])
    logger.close()
    return paths
