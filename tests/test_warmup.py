import os

import numpy as np
import pytest

from consistent__style_transfer_tpu.config import make_config


def _cfg(tiny_corpus, tmp_path):
    cfg = make_config("tiny")
    cfg.data_dir = os.path.dirname(tiny_corpus)
    cfg.dump_dir = str(tmp_path / "dump")
    cfg.log_dir = str(tmp_path / "log")
    cfg.out_dir = str(tmp_path / "out")
    cfg.max_len = 10
    cfg.vocab_size = 150
    cfg.batch_size = 4
    cfg.warmup_batch_size = 4
    cfg.warmup_epochs = 2
    cfg.mesh.n_data = 2
    return cfg


@pytest.mark.slow
def test_warmup_end_to_end(tiny_corpus, tmp_path):
    from consistent__style_transfer_tpu.train.warmup import run_warmup

    cfg = _cfg(tiny_corpus, tmp_path)
    g_path = run_warmup(cfg, progress=False)
    assert os.path.exists(g_path)
    # tokenizer artifacts were created in the dump dir
    vocab_path, merges_path = cfg.vocab_paths
    assert os.path.exists(vocab_path) and os.path.exists(merges_path)
    # log stream exists and contains a val_loss record
    events = open(f"{cfg.log_dir}/tiny/warmup/events.jsonl").read()
    assert "val_loss" in events


@pytest.mark.slow
def test_warmup_loss_decreases(tiny_corpus, tmp_path):
    """Denoising CE must drop on a memorizable corpus."""
    import jax

    from consistent__style_transfer_tpu.data.pipeline import make_batches
    from consistent__style_transfer_tpu.parallel.sharding import replicate, shard_batch
    from consistent__style_transfer_tpu.train.common import (
        build_generator,
        get_corpus,
        get_mesh,
        get_tokenizer,
        step_rngs,
    )
    from consistent__style_transfer_tpu.train.state import TrainState, adam_with_clip
    from consistent__style_transfer_tpu.train.warmup import make_warmup_steps
    import jax.numpy as jnp

    cfg = _cfg(tiny_corpus, tmp_path)
    tok = get_tokenizer(cfg)
    mesh = get_mesh(cfg)
    corpus = get_corpus(cfg, "train", tok)
    it = make_batches(corpus, 4, cfg.max_len, "warmup", shuffle=True, seed=0)
    model = build_generator(cfg, len(tok))
    key = jax.random.PRNGKey(0)
    x0 = jnp.zeros((2, cfg.max_len), jnp.int32)
    l0 = jnp.zeros((2,), jnp.int32)
    params = replicate(model.init(key, x0, l0, x0, l0, deterministic=True), mesh)
    state = TrainState.create(params, adam_with_clip(5e-3, 1.0))
    train_step, _ = make_warmup_steps(model)

    losses = []
    step = 0
    for _ in range(12):
        for batch in it:
            state, loss = train_step(state, shard_batch(batch.arrays, mesh),
                                     key, step)
            losses.append(float(loss))
            step += 1
    assert np.mean(losses[-3:]) < 0.7 * np.mean(losses[:3])
