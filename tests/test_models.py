import jax
import jax.numpy as jnp
import numpy as np
import pytest

from consistent__style_transfer_tpu.models import (
    DenoiseSeq2Seq,
    PairMatcher,
    RelGANDiscriminator,
    TextCNN,
    TransformerLM,
)

V, B, L, NC = 50, 4, 9, 2


@pytest.fixture(scope="module")
def keys():
    return jax.random.split(jax.random.PRNGKey(0), 8)


@pytest.fixture(scope="module")
def hard_batch(keys):
    x = jax.random.randint(keys[0], (B, L), 0, V)
    labels = jax.random.randint(keys[1], (B,), 0, NC)
    return x, labels


@pytest.fixture(scope="module")
def soft_batch(keys):
    p = jax.nn.softmax(jax.random.normal(keys[2], (B, L, V)), axis=-1)
    return p


def test_textcnn_dual_path(hard_batch, soft_batch, keys):
    x, _ = hard_batch
    model = TextCNN(n_vocab=V, n_class=NC)
    params = model.init(keys[3], x)
    hard_logits = model.apply(params, x)
    assert hard_logits.shape == (B, NC)
    soft_logits = model.apply(params, soft_batch)
    assert soft_logits.shape == (B, NC)
    # one-hot soft input == hard input (exact dual-path equivalence)
    onehot = jax.nn.one_hot(x, V)
    np.testing.assert_allclose(model.apply(params, onehot), hard_logits, rtol=1e-5)


def test_lm_shapes_and_dual_path(hard_batch, soft_batch, keys):
    x, _ = hard_batch
    model = TransformerLM(n_vocab=V)
    params = model.init(keys[4], x)
    out = model.apply(params, x)
    assert out.shape == (B, L, V)
    out_soft = model.apply(params, soft_batch)
    assert out_soft.shape == (B, L, V)
    onehot = jax.nn.one_hot(x, V)
    # gather vs one-hot-matmul accumulate differently; 6 post-LN layers
    # amplify the f32 noise, so compare loosely
    np.testing.assert_allclose(model.apply(params, onehot), out, atol=0.03)


def test_matcher_pair_scalar(hard_batch, soft_batch, keys):
    x, _ = hard_batch
    model = PairMatcher(n_vocab=V)
    params = model.init(keys[5], x, x)
    out = model.apply(params, x, x)
    assert out.shape == (B,)
    out2 = model.apply(params, soft_batch, x)  # soft first arg (optimize c_loss)
    assert out2.shape == (B,)


def test_matcher_remat_identical(hard_batch, keys):
    # remat_scorers is a lifted transform: forward AND gradients must be
    # bit-identical to the save-activations default (RESULTS.md "remat
    # scorers A/B" — the knob is a memory lever, not a numerics change).
    x, _ = hard_batch
    save = PairMatcher(n_vocab=V)
    re = PairMatcher(n_vocab=V, remat=True)
    params = save.init(keys[5], x, x)

    def loss(m, p):
        return jnp.sum(m.apply(p, x, x) ** 2)

    np.testing.assert_array_equal(save.apply(params, x, x),
                                  re.apply(params, x, x))
    g1 = jax.grad(lambda p: loss(save, p))(params)
    g2 = jax.grad(lambda p: loss(re, p))(params)
    jax.tree_util.tree_map(np.testing.assert_array_equal, g1, g2)


def test_discriminator_logits_per_rep(hard_batch, soft_batch, keys):
    x, _ = hard_batch
    model = RelGANDiscriminator(n_vocab=V)
    params = model.init(keys[6], x)
    out = model.apply(params, x)
    assert out.shape == (B * 16,)
    out_soft = model.apply(params, soft_batch)
    assert out_soft.shape == (B * 16,)
    onehot = jax.nn.one_hot(x, V)
    np.testing.assert_allclose(model.apply(params, onehot), out, rtol=1e-5, atol=1e-5)


def test_generator_greedy_shapes(hard_batch, keys):
    x, labels = hard_batch
    model = DenoiseSeq2Seq(n_vocab=V, n_class=NC, max_len=L)
    params = model.init(keys[7], x, labels, None, labels, deterministic=True)
    logits = model.apply(params, x, labels, None, 1 - labels, mode="sched",
                         deterministic=True)
    assert logits.shape == (B, L, V)


def test_generator_greedy_ids_match_sched_argmax(hard_batch, keys):
    """The ids-emitting fast path must agree with argmax over the logits path."""
    x, labels = hard_batch
    model = DenoiseSeq2Seq(n_vocab=V, n_class=NC, max_len=L)
    params = model.init(keys[7], x, labels, None, labels, deterministic=True)
    logits = model.apply(params, x, labels, None, 1 - labels, mode="sched",
                         deterministic=True)
    ids = model.apply(params, x, labels, None, 1 - labels, mode="greedy",
                      deterministic=True)
    assert ids.shape == (B, L)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(jnp.argmax(logits, -1)))


def test_generator_time_major_out_ids_stay_batch_major(hard_batch, keys):
    """time_major_out applies to SOFT (L, B, V) stacks only; integer id
    outputs are batch-major (B, L) regardless of the flag, so both backbones
    expose one contract (train.common.generator_call)."""
    x, labels = hard_batch
    model = DenoiseSeq2Seq(n_vocab=V, n_class=NC, max_len=L)
    params = model.init(keys[7], x, labels, None, labels, deterministic=True)
    ids_tm = model.apply(params, x, labels, None, 1 - labels, mode="greedy",
                         deterministic=True, time_major_out=True)
    ids_bm = model.apply(params, x, labels, None, 1 - labels, mode="greedy",
                         deterministic=True)
    assert ids_tm.shape == (B, L)
    np.testing.assert_array_equal(np.asarray(ids_tm), np.asarray(ids_bm))
    soft_tm = model.apply(params, x, labels, None, 1 - labels, mode="st",
                          tau=0.5, deterministic=True, time_major_out=True,
                          rngs={"coin": keys[8]})
    assert soft_tm.shape == (L, B, V)


def test_generator_rep_penalty_blocks_repeats(hard_batch, keys):
    """With a large repetition penalty, greedy decode never emits the same
    content token (id >= 3) twice in a sentence; with penalty 0 the decode is
    bit-identical to the default path (same params, same carry semantics)."""
    x, labels = hard_batch
    base = DenoiseSeq2Seq(n_vocab=V, n_class=NC, max_len=L)
    params = base.init(keys[7], x, labels, None, labels, deterministic=True)
    ids0 = base.apply(params, x, labels, None, 1 - labels, mode="greedy",
                      deterministic=True)
    pen = DenoiseSeq2Seq(n_vocab=V, n_class=NC, max_len=L, rep_penalty=1e9)
    ids1 = pen.apply(params, x, labels, None, 1 - labels, mode="greedy",
                     deterministic=True)
    for row in np.asarray(ids1):
        content = row[row >= 3]
        assert len(set(content.tolist())) == len(content), row
    zero = DenoiseSeq2Seq(n_vocab=V, n_class=NC, max_len=L, rep_penalty=0.0)
    np.testing.assert_array_equal(
        np.asarray(zero.apply(params, x, labels, None, 1 - labels,
                              mode="greedy", deterministic=True)),
        np.asarray(ids0))
    # training modes are untouched by the knob
    logits_pen = pen.apply(params, x, labels, None, 1 - labels, mode="sched",
                           deterministic=True)
    logits_base = base.apply(params, x, labels, None, 1 - labels, mode="sched",
                             deterministic=True)
    np.testing.assert_array_equal(np.asarray(logits_pen), np.asarray(logits_base))


def test_generator_pallas_head_matches(hard_batch, keys):
    """Greedy decode with the fused Pallas head (interpret mode) equals the
    plain jnp path, using the same checkpoint layout."""
    x, labels = hard_batch
    plain = DenoiseSeq2Seq(n_vocab=V, n_class=NC, max_len=L)
    fused = DenoiseSeq2Seq(n_vocab=V, n_class=NC, max_len=L,
                           use_pallas=True, pallas_interpret=True)
    params = plain.init(keys[7], x, labels, None, labels, deterministic=True)
    ids_plain = plain.apply(params, x, labels, None, 1 - labels,
                            mode="greedy", deterministic=True)
    ids_fused = fused.apply(params, x, labels, None, 1 - labels,
                            mode="greedy", deterministic=True)
    np.testing.assert_array_equal(np.asarray(ids_plain), np.asarray(ids_fused))


def test_generator_teacher_forced_shapes(hard_batch, keys):
    x, labels = hard_batch
    model = DenoiseSeq2Seq(n_vocab=V, n_class=NC, max_len=L)
    params = model.init(keys[7], x, labels, None, labels, deterministic=True)
    longer = jnp.concatenate([x, x], axis=1)  # teacher length L_out = 2L
    out = model.apply(
        params, x, labels, longer, labels, mode="sched", deterministic=False,
        rngs={"dropout": keys[0], "coin": keys[1]},
    )
    assert out.shape == (B, 2 * L, V)


def test_generator_st_probs_and_gradient(hard_batch, keys):
    """The straight-through decode must (a) return probability rows, (b) pass
    gradients back to the parameters through the whole rollout."""
    x, labels = hard_batch
    model = DenoiseSeq2Seq(n_vocab=V, n_class=NC, max_len=L)
    params = model.init(keys[7], x, labels, None, labels, deterministic=True)

    def loss_fn(p):
        probs = model.apply(p, x, labels, None, 1 - labels, mode="st", tau=0.5,
                            deterministic=True)
        return jnp.sum(probs[:, :, 0])

    probs = model.apply(params, x, labels, None, 1 - labels, mode="st",
                        tau=0.5, deterministic=True)
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, rtol=1e-4)
    grads = jax.grad(loss_fn)(params)
    gnorm = sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads))
    assert gnorm > 0, "no gradient through straight-through decode"
    emb_grad = grads["params"]["token_embedding"]["embedding"]
    assert float(jnp.abs(emb_grad).sum()) > 0, "no gradient into embeddings (feedback path)"


def test_generator_gumbel_mode(hard_batch, keys):
    x, labels = hard_batch
    model = DenoiseSeq2Seq(n_vocab=V, n_class=NC, max_len=L)
    params = model.init(keys[7], x, labels, None, labels, deterministic=True)
    probs = model.apply(params, x, labels, None, 1 - labels, mode="gumbel",
                        tau=0.5, deterministic=True,
                        rngs={"gumbel": keys[2]})
    assert probs.shape == (B, L, V)
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, rtol=1e-4)
    # different gumbel keys give different relaxed samples
    probs2 = model.apply(params, x, labels, None, 1 - labels, mode="gumbel",
                         tau=0.5, deterministic=True,
                         rngs={"gumbel": keys[3]})
    assert float(jnp.abs(probs - probs2).max()) > 0


def test_generator_soft_encoder_input(hard_batch, soft_batch, keys):
    x, labels = hard_batch
    model = DenoiseSeq2Seq(n_vocab=V, n_class=NC, max_len=L)
    params = model.init(keys[7], x, labels, None, labels, deterministic=True)
    out = model.apply(params, soft_batch, labels, None, labels, mode="sched",
                      deterministic=True)
    assert out.shape == (B, L, V)


def test_generator_jit_and_scan_static(hard_batch, keys):
    """The decode must be compile-once: two different batches reuse one trace."""
    x, labels = hard_batch
    model = DenoiseSeq2Seq(n_vocab=V, n_class=NC, max_len=L)
    params = model.init(keys[7], x, labels, None, labels, deterministic=True)
    traces = 0

    @jax.jit
    def f(p, x, lab):
        nonlocal traces
        traces += 1
        return model.apply(p, x, lab, None, 1 - lab, mode="sched", deterministic=True)

    f(params, x, labels)
    f(params, jnp.flip(x, 0), 1 - labels)
    assert traces == 1
