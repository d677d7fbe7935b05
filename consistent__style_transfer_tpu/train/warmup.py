"""Warmup stage: train the generator with a denoising-autoencoder objective
(reference ``src/main_warmup.py``): CE(G(transfer_noise(x, 0.1), label,
teacher=x, label), x), Adam lr=1e-3, global-norm clip 1.0, 1 epoch, batch 512,
EarlyStopping(patience=1), best ``G`` saved on val improvement.

TPU design: one jitted train step (full scan decode + backward), batches
sharded over the mesh's data axis; grads are averaged by XLA's psum under the
hood. The step compiles once (static shapes from the pipeline)."""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp

from ..config import Config
from ..data.pipeline import eval_arrays, make_batches
from ..data.prefetch import DevicePrefetcher
from ..ops.losses import softmax_cross_entropy_tokens
from ..parallel.sharding import replicate, shard_batch
from ..utils.io import RunLogger
from .common import (build_generator, get_corpus, get_mesh,
                     get_tokenizer, make_key, step_rngs)
from .loop import EarlyStopper, Throughput
from .state import BestKeeper, TrainState, adam_with_clip, save_params


def warmup_ckpt_name(cfg: Config) -> str:
    """Reference name for the reference backbone; backbone-qualified
    otherwise, so alternate backbones never clobber the lstm G
    (``dump/<ds>/warmup/G.pth`` contract, ``src/main_warmup.py:77``)."""
    return "G.msgpack" if cfg.backbone == "lstm" else f"G_{cfg.backbone}.msgpack"


def make_warmup_steps(model):
    from .common import generator_call

    @jax.jit
    def train_step(state: TrainState, batch, base_key, step):
        # RNG folding traced inside the jit (one dispatch per batch; exact
        # reproduction of step_rngs(base_key, step))
        k = jax.random.fold_in(base_key, step)
        ks = jax.random.split(k, 2)
        rngs = {"dropout": ks[0], "coin": ks[1]}

        def loss_fn(params):
            logits = generator_call(
                model, params, batch["nx"], batch["labels"], batch["x"],
                batch["labels"], mode="sched", deterministic=False, rngs=rngs,
            )
            return softmax_cross_entropy_tokens(logits, batch["x"])

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads), loss

    @jax.jit
    def eval_step(params, batch, rngs):
        logits = generator_call(
            model, params, batch["nx"], batch["labels"], batch["x"],
            batch["labels"], mode="sched", deterministic=True, rngs=rngs,
        )
        # optional "row_mask" (data/pipeline.py::eval_arrays) masks padded
        # duplicate rows out of the val mean
        return softmax_cross_entropy_tokens(logits, batch["x"],
                                            row_mask=batch.get("row_mask"))

    return train_step, eval_step


def run_warmup(cfg: Config, progress: bool = True) -> str:
    """Returns the path of the best generator checkpoint."""
    tokenizer = get_tokenizer(cfg)
    mesh = get_mesh(cfg)
    task_dump = os.path.join(cfg.ds_dump_dir, "warmup")
    os.makedirs(task_dump, exist_ok=True)
    g_path = os.path.join(task_dump, warmup_ckpt_name(cfg))

    train_corpus = get_corpus(cfg, "train", tokenizer)
    dev_corpus = get_corpus(cfg, "dev", tokenizer)
    bs = cfg.warmup_batch_size
    train_it = make_batches(train_corpus, bs, cfg.max_len, "warmup",
                            shuffle=True, seed=cfg.seed)
    dev_it = make_batches(dev_corpus, bs, cfg.max_len, "warmup",
                          shuffle=False, seed=cfg.seed)

    model = build_generator(cfg, len(tokenizer))
    key = make_key(cfg)
    x0 = jnp.zeros((2, cfg.max_len), jnp.int32)
    l0 = jnp.zeros((2,), jnp.int32)
    params = model.init(key, x0, l0, x0, l0, deterministic=True)
    params = replicate(params, mesh)
    state = TrainState.create(params, adam_with_clip(cfg.warmup_lr, cfg.warmup_clip))

    train_step, eval_step = make_warmup_steps(model)
    logger = RunLogger(f"{cfg.log_dir}/{cfg.dataset}", "warmup", config=cfg)
    stopper = EarlyStopper(cfg.warmup_patience)
    keeper = BestKeeper("min")
    thru = Throughput()

    step = 0
    for epoch in range(cfg.warmup_epochs):
        for batch, arrays in DevicePrefetcher(train_it, mesh):
            state, loss = train_step(state, arrays, key, step)
            thru.add(bs)
            if step % 50 == 0:
                logger.log(step, dn_loss=loss, **thru.rates())
            step += 1

        # validation (epoch end)
        losses, weights = [], []
        for batch in dev_it:
            loss = eval_step(state.params, shard_batch(eval_arrays(batch), mesh),
                             step_rngs(key, 10_000_000 + step))
            losses.append(float(loss))
            weights.append(batch.valid)
        val_loss = sum(l * w for l, w in zip(losses, weights)) / max(sum(weights), 1)
        logger.log(step, val_loss=val_loss, epoch=epoch)
        if progress:
            print(f"[warmup] epoch {epoch} val_loss {val_loss:.4f} "
                  f"{thru.rates()['sentences_per_sec']:.1f} sent/s")
        keeper.update(val_loss, state.params, g_path)
        if stopper.update(val_loss):
            break

    if keeper.last_path is None:  # no validation improvement recorded at all
        save_params(state.params, g_path)
    logger.close()
    return g_path
