"""Mesh / sharding tests on the 8-device virtual CPU mesh: DP batch sharding
reproduces single-device math, TP rules shard the intended params and keep
transformer outputs numerically identical."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from consistent__style_transfer_tpu.models import TransformerLM
from consistent__style_transfer_tpu.parallel.mesh import make_mesh
from consistent__style_transfer_tpu.parallel.sharding import (
    param_shardings,
    replicate,
    shard_batch,
    shard_params,
)

V, B, L = 64, 16, 6


def test_make_mesh_shapes():
    mesh = make_mesh(4, 2)
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    mesh = make_mesh()  # all devices on data
    assert mesh.shape["data"] == 8 and mesh.shape["model"] == 1


def test_param_shardings_rules():
    mesh = make_mesh(4, 2)
    model = TransformerLM(n_vocab=V)
    x = jnp.zeros((2, L), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x)
    shardings = param_shardings(params, mesh)
    flat = jax.tree_util.tree_flatten_with_path(shardings)[0]
    by_path = {"/".join(str(getattr(k, "key", k)) for k in path): s
               for path, s in flat}
    assert by_path["params/lm/layer_0/self_attn/in_proj/kernel"].spec == P(None, "model")
    assert by_path["params/lm/layer_0/self_attn/out_proj/kernel"].spec == P("model", None)
    assert by_path["params/lm/layer_0/linear1/kernel"].spec == P(None, "model")
    assert by_path["params/lm/layer_0/linear2/kernel"].spec == P("model", None)
    assert by_path["params/fwd/kernel"].spec == P(None, "model")
    # embeddings stay replicated
    assert by_path["params/token_embedding/embedding"].spec == P()


def test_tp_output_matches_replicated():
    model = TransformerLM(n_vocab=V)
    x = np.random.default_rng(0).integers(0, V, (B, L)).astype(np.int32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))

    mesh1 = make_mesh(8, 1)
    rep = replicate(params, mesh1)
    out_rep = jax.jit(lambda p, x: model.apply(p, x))(rep, jnp.asarray(x))

    mesh2 = make_mesh(4, 2)
    tp = shard_params(params, mesh2)
    batch = shard_batch({"x": x}, mesh2)
    out_tp = jax.jit(lambda p, x: model.apply(p, x))(tp, batch["x"])
    np.testing.assert_allclose(np.asarray(out_rep), np.asarray(out_tp),
                               atol=2e-4)


@pytest.mark.slow
def test_dp_grads_match_single_device():
    """Mean loss over a sharded batch must give the same gradients as
    unsharded — XLA inserts the psum from the shardings alone."""
    model = TransformerLM(n_vocab=V)
    rng = np.random.default_rng(1)
    x = rng.integers(0, V, (B, L)).astype(np.int32)
    y = rng.integers(0, V, (B, L)).astype(np.int32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))

    def loss_fn(p, x, y):
        logits = model.apply(p, x)
        logp = jax.nn.log_softmax(logits)
        return -jnp.mean(jnp.take_along_axis(logp, y[..., None], -1))

    g_single = jax.grad(loss_fn)(params, jnp.asarray(x), jnp.asarray(y))

    mesh = make_mesh(8, 1)
    rep = replicate(params, mesh)
    batch = shard_batch({"x": x, "y": y}, mesh)
    g_dp = jax.jit(jax.grad(loss_fn))(rep, batch["x"], batch["y"])

    for a, b in zip(jax.tree.leaves(g_single), jax.tree.leaves(g_dp)):
        # psum reduction order differs from the fused single-device reduction;
        # f32 noise compounds through 6 post-LN layers
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)


def test_shard_batch_places_on_data_axis():
    mesh = make_mesh(8, 1)
    batch = shard_batch({"x": np.zeros((16, 4), np.int32)}, mesh)
    assert batch["x"].sharding.spec == P("data", None)


@pytest.mark.slow
def test_optimize_step_tp_mesh(capsys):
    """The driver-gated multi-chip exercise, in CI: 8 full optimize GAN
    steps (two D-accumulation cycles; ST decode + back-translation + D grads
    + val scoring) on a data=2 x model=2 TP mesh must compile, run, produce
    finite losses, reset the D accumulator on each apply (asserted inside),
    and survive an Orbax save/restore/continue of the full sharded state.

    Runs through ``__graft_entry__.dryrun_multichip`` — i.e. in a clean
    child interpreter, exactly as the driver invokes it.  Running
    ``optimize_step_on_mesh`` inline here deadlocks flakily: this pytest
    process holds 8 virtual CPU devices plus compiled executables and
    their (spin-waiting) thread pools, and the 8-replica collective
    rendezvous can then fail to get all device threads scheduled on this
    1-core host (SIGABRT at the XLA CPU rendezvous terminate timeout).
    The child uses 4 devices, not the driver's 8, for the same reason:
    measured on this host, an 8-device child under a live pytest parent
    starves an all-reduce past the 600 s termination timeout, while the
    driver's own gate (fresh process, idle host) runs 8 devices fine."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as gate

    gate.dryrun_multichip(4)  # raises on child failure
    out = capsys.readouterr().out
    assert "dryrun_multichip ok" in out
    assert "mesh={'data': 2, 'model': 2}" in out
    assert "steps=9" in out and "ckpt_roundtrip=True" in out


def test_shard_batch_multihost_single_process_equivalence():
    """Index-domain correctness of the multi-host input path: with one
    process, ``shard_batch_multihost`` (each host feeds its local rows via
    ``jax.make_array_from_process_local_data``) must produce exactly the
    arrays ``shard_batch`` places — same global values, same shardings
    (SURVEY §2.6 per-host data sharding; the >1-process branch is the same
    call with a smaller local array)."""
    from consistent__style_transfer_tpu.parallel.sharding import (
        shard_batch_multihost,
    )

    mesh = make_mesh(8, 1)
    rng = np.random.default_rng(0)
    host = {"x": rng.integers(0, 99, (16, 4)).astype(np.int32),
            "labels": rng.integers(0, 2, (16,)).astype(np.int32)}
    a = shard_batch(dict(host), mesh)
    b = shard_batch_multihost(dict(host), mesh)
    for k in host:
        assert a[k].sharding == b[k].sharding
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))
