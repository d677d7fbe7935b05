import jax
import jax.numpy as jnp
import numpy as np
import pytest

from consistent__style_transfer_tpu.models import DenoiseSeq2Seq
from consistent__style_transfer_tpu.models.beam import beam_decode_any

V, B, L = 40, 3, 5


@pytest.fixture(scope="module")
def lstm_setup():
    model = DenoiseSeq2Seq(n_vocab=V, n_class=2, max_len=L)
    key = jax.random.PRNGKey(0)
    x = jax.random.randint(key, (B, L), 0, V)
    labels = jnp.zeros((B,), jnp.int32)
    params = model.init(key, x, labels, None, labels, deterministic=True)
    return model, params, x, labels


def test_lstm_teacher_mode_matches_greedy_feedback(lstm_setup):
    """teacher mode on a greedy-generated sequence reproduces the greedy
    argmax at every step (the rescoring identity beam relies on)."""
    model, params, x, labels = lstm_setup
    ids = model.apply(params, x, labels, None, 1 - labels, mode="greedy",
                      deterministic=True)
    logits = model.apply(params, x, labels, ids, 1 - labels, mode="teacher",
                         deterministic=True)
    np.testing.assert_array_equal(np.asarray(jnp.argmax(logits, -1)),
                                  np.asarray(ids))


def test_lstm_beam1_equals_greedy(lstm_setup):
    model, params, x, labels = lstm_setup
    greedy = model.apply(params, x, labels, None, 1 - labels, mode="greedy",
                         deterministic=True)
    ids, scores = beam_decode_any(model, params, x, labels, 1 - labels,
                                  beam_size=1, length_penalty=1.0)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(greedy))
    assert np.isfinite(np.asarray(scores)).all()


def test_lstm_beam4_scores_are_true_logprobs(lstm_setup):
    model, params, x, labels = lstm_setup
    ids, scores = beam_decode_any(model, params, x, labels, 1 - labels,
                                  beam_size=4, length_penalty=1.0)
    logits = model.apply(params, x, labels, ids, 1 - labels, mode="teacher",
                         deterministic=True)
    logp = jax.nn.log_softmax(logits)
    true = jnp.take_along_axis(logp, ids[..., None], -1)[..., 0].sum(-1) / L
    np.testing.assert_allclose(np.asarray(scores), np.asarray(true),
                               rtol=1e-4, atol=1e-4)


def test_lstm_stateful_beam_matches_prefix_rescoring(lstm_setup):
    """The carried-(h,c) beam (BeamDenoiseSeq2Seq) must pick the same
    sequences and scores as the O(L^2) prefix-rescoring construction it
    replaced (teacher-forced full pass per step)."""
    from consistent__style_transfer_tpu.models.beam import beam_search

    model, params, x, labels = lstm_setup
    K = 3
    ids_new, scores_new = beam_decode_any(model, params, x, labels,
                                          1 - labels, beam_size=K,
                                          length_penalty=0.6)

    x_rep = jnp.repeat(x, K, 0)
    li_rep = jnp.repeat(labels, K, 0)
    tl_rep = jnp.repeat(1 - labels, K, 0)

    def next_logp(prefix, t, expanded):
        xs = x_rep if expanded else x
        lis = li_rep if expanded else labels
        tls = tl_rep if expanded else 1 - labels
        logits = model.apply(params, xs, lis, prefix, tls, mode="teacher",
                             deterministic=True)
        return jax.nn.log_softmax(logits[:, t])

    ids_old, scores_old = beam_search(next_logp, B, L, V, beam_size=K,
                                      length_penalty=0.6)
    np.testing.assert_array_equal(np.asarray(ids_new), np.asarray(ids_old))
    np.testing.assert_allclose(np.asarray(scores_new), np.asarray(scores_old),
                               rtol=1e-5, atol=1e-5)
