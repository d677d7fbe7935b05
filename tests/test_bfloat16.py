"""bfloat16 compute-dtype path (params stay f32 — flax Dense/Embed promote
compute only): the TPU production configuration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from consistent__style_transfer_tpu.models import DenoiseSeq2Seq, TextCNN

V, B, L = 40, 4, 6


@pytest.mark.slow
def test_generator_bf16_forward_and_grads():
    model = DenoiseSeq2Seq(n_vocab=V, n_class=2, max_len=L, dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    x = jax.random.randint(key, (B, L), 0, V)
    labels = jnp.zeros((B,), jnp.int32)
    params = model.init(key, x, labels, None, labels, deterministic=True)
    # params remain f32
    assert all(leaf.dtype == jnp.float32 for leaf in jax.tree.leaves(params))

    probs = model.apply(params, x, labels, None, 1 - labels, mode="st",
                        tau=0.5, deterministic=True)
    assert probs.dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(probs, np.float32)).all()

    def loss(p):
        out = model.apply(p, x, labels, None, 1 - labels, mode="st", tau=0.5,
                          deterministic=True)
        return jnp.sum(out.astype(jnp.float32)[:, :, 0])

    grads = jax.grad(loss)(params)
    flat = jax.tree.leaves(grads)
    assert all(g.dtype == jnp.float32 for g in flat)
    assert np.isfinite(sum(float(jnp.abs(g).sum()) for g in flat))


def test_textcnn_bf16_close_to_f32():
    key = jax.random.PRNGKey(0)
    x = jax.random.randint(key, (B, L), 0, V)
    m32 = TextCNN(n_vocab=V, n_class=2)
    m16 = TextCNN(n_vocab=V, n_class=2, dtype=jnp.bfloat16)
    params = m32.init(key, x)
    out32 = np.asarray(m32.apply(params, x))
    out16 = np.asarray(m16.apply(params, x), dtype=np.float32)
    np.testing.assert_allclose(out16, out32, atol=0.15)  # bf16 has ~3 digits
