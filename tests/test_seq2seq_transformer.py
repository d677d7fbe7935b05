import jax
import jax.numpy as jnp
import numpy as np
import pytest

from consistent__style_transfer_tpu.models.seq2seq_transformer import (
    TransformerSeq2Seq,
    beam_decode,
    generate,
)

V, B, L, NC = 50, 3, 6, 2


@pytest.fixture(scope="module")
def setup():
    model = TransformerSeq2Seq(n_vocab=V, n_class=NC, max_len=L)
    key = jax.random.PRNGKey(0)
    x = jax.random.randint(key, (B, L), 0, V)
    labels = jnp.zeros((B,), jnp.int32)
    params = model.init(key, x, labels, None, labels, deterministic=True)
    return model, params, x, labels


def test_teacher_forced_shapes(setup):
    model, params, x, labels = setup
    logits = model.apply(params, x, labels, x, labels, mode="sched",
                         deterministic=True)
    assert logits.shape == (B, L, V)


def test_greedy_generate(setup):
    model, params, x, labels = setup
    ids = generate(model, params, x, labels, 1 - labels, mode="greedy")
    assert ids.shape == (B, L)
    assert ids.dtype == jnp.int32


def test_greedy_consistent_with_teacher_rescore(setup):
    """Greedy output fed back as teacher must reproduce its own argmax at
    every step (KV-cache decode == parallel causal pass)."""
    model, params, x, labels = setup
    ids = generate(model, params, x, labels, 1 - labels, mode="greedy")
    logits = model.apply(params, x, labels, ids, 1 - labels, mode="sched",
                         deterministic=True)
    np.testing.assert_array_equal(np.asarray(jnp.argmax(logits, -1)),
                                  np.asarray(ids))


@pytest.mark.slow
def test_st_mode_probs_and_grads(setup):
    model, params, x, labels = setup

    def loss_fn(p):
        probs = generate(model, p, x, labels, 1 - labels, mode="st", tau=0.5)
        return jnp.sum(probs[:, :, 0])

    probs = generate(model, params, x, labels, 1 - labels, mode="st", tau=0.5)
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, rtol=1e-4)
    grads = jax.grad(loss_fn)(params)
    total = sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads))
    assert total > 0


def _rescore(model, params, x, labels, ids):
    """Sum of per-step log-probs of `ids` under teacher forcing."""
    logits = model.apply(params, x, labels, ids, 1 - labels, mode="sched",
                         deterministic=True)
    logp = jax.nn.log_softmax(logits)
    return jnp.take_along_axis(logp, ids[..., None], -1)[..., 0].sum(-1)


@pytest.mark.slow
def test_beam_scores_and_beam1_equals_greedy(setup):
    model, params, x, labels = setup
    g_ids, g_score = beam_decode(model, params, x, labels, 1 - labels,
                                 beam_size=1, length_penalty=1.0)
    greedy = generate(model, params, x, labels, 1 - labels, mode="greedy")
    np.testing.assert_array_equal(np.asarray(g_ids), np.asarray(greedy))

    ids4, score4 = beam_decode(model, params, x, labels, 1 - labels,
                               beam_size=4, length_penalty=1.0)
    # reported scores must equal the true (length-normalized) sequence
    # log-probabilities under the model
    np.testing.assert_allclose(
        np.asarray(score4), np.asarray(_rescore(model, params, x, labels, ids4)) / L,
        rtol=1e-4, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(g_score), np.asarray(_rescore(model, params, x, labels, g_ids)) / L,
        rtol=1e-4, atol=1e-4,
    )


@pytest.mark.slow
def test_backbone_dispatch_in_drivers(setup, tiny_corpus, tmp_path):
    """Config.backbone='transformer' flows through warmup steps and the
    transfer step unchanged."""
    import numpy as np

    from consistent__style_transfer_tpu.config import make_config
    from consistent__style_transfer_tpu.train.common import build_generator, generator_call
    from consistent__style_transfer_tpu.train.state import TrainState, adam_with_clip
    from consistent__style_transfer_tpu.train.warmup import make_warmup_steps

    cfg = make_config("tiny", max_len=L, vocab_size=V)
    cfg.backbone = "transformer"
    model = build_generator(cfg, V)
    assert type(model).__name__ == "TransformerSeq2Seq"

    key = jax.random.PRNGKey(0)
    x = jax.random.randint(key, (4, L), 0, V)
    labels = jnp.zeros((4,), jnp.int32)
    params = model.init(key, x, labels, None, labels, deterministic=True)
    state = TrainState.create(params, adam_with_clip(1e-3, 1.0))
    train_step, eval_step = make_warmup_steps(model)
    batch = {"nx": np.asarray(x), "x": np.asarray(x),
             "labels": np.asarray(labels)}
    state, loss = train_step(state, batch, jax.random.PRNGKey(1), 0)
    assert np.isfinite(float(loss))
    ids = generator_call(model, state.params, x, labels, None, 1 - labels,
                         mode="greedy", deterministic=True)
    assert ids.shape == (4, L)


def test_dropout_rngs_path(setup):
    model, params, x, labels = setup
    out = generate(model, params, x, labels, 1 - labels, mode="st", tau=1.0,
                   deterministic=False,
                   rngs={"dropout": jax.random.PRNGKey(3)})
    assert out.shape == (B, L, V)
