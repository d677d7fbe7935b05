"""Trajectory equivalence of the k-step megastep (Config.megastep_k): one
``lax.scan`` dispatch over k stacked batches must reproduce the per-batch
``fused_step`` loop exactly — same G/D params, same D-grad accumulator, same
per-batch losses — including the reference's every-4th-batch D apply cadence
(``src/main_optimize.py:85-88``) and a tail group of size n % k."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from consistent__style_transfer_tpu.config import make_config
from consistent__style_transfer_tpu.data.pipeline import Batch, MegaBatches
from consistent__style_transfer_tpu.train.optimize import (
    OptimizeModels,
    make_optimize_steps,
)
from consistent__style_transfer_tpu.train.state import TrainState, adam_with_clip

V = 50
B, L = 4, 10
N_BATCHES = 6  # k=4 leaves a tail of 2 -> exercises the partial group too


@pytest.fixture(scope="module")
def setup():
    cfg = make_config("tiny")
    cfg.max_len = L
    cfg.d_update_every = 4
    models = OptimizeModels(cfg, V)
    key = jax.random.PRNGKey(0)
    kc, km, kn, kg, kd, kx = jax.random.split(key, 6)
    x0 = jnp.zeros((B, L), jnp.int32)
    n0 = jnp.zeros((B, L + L // 2), jnp.int32)
    l0 = jnp.zeros((B,), jnp.int32)
    frozen = {
        "cls": models.classifier.init(kc, x0),
        "mat": models.matcher.init(km, n0, n0),
        "nt": models.nt_checker.init(kn, x0),
    }
    g_params = models.generator.init(kg, x0, l0, None, l0, deterministic=True)
    d_params = models.disc.init(kd, x0)
    rng = np.random.default_rng(5)
    batches = [
        {
            "x": jnp.asarray(rng.integers(3, V, (B, L)), jnp.int32),
            "labels": jnp.asarray(rng.integers(0, 2, (B,)), jnp.int32),
        }
        for _ in range(N_BATCHES)
    ]
    return cfg, models, frozen, g_params, d_params, batches


def _states(g_params, d_params):
    opt = adam_with_clip(1e-4, 1.0)
    g = TrainState.create(g_params, opt)
    d = TrainState.create(d_params, opt)
    acc = jax.tree.map(jnp.zeros_like, d.params)
    return g, d, acc


@pytest.mark.slow
def test_megastep_matches_per_batch_loop(setup):
    cfg, models, frozen, g_params, d_params, batches = setup
    steps = make_optimize_steps(cfg, models)
    key = jax.random.PRNGKey(11)
    d_base = jax.random.fold_in(key, 1)

    # reference trajectory: per-batch fused_step with static do_apply
    g1, d1, acc1 = _states(g_params, d_params)
    ref_aux = []
    for i, batch in enumerate(batches):
        g1, d1, acc1, aux, d_loss = steps.fused_step(
            g1, d1, acc1, frozen, batch, key, d_base, i,
            do_apply=(i % cfg.d_update_every == 0))
        ref_aux.append((float(aux["loss"]), float(d_loss)))

    # megastep trajectory: k=4 group + tail of 2, same absolute step ids
    g2, d2, acc2 = _states(g_params, d_params)
    mega_aux = []
    step = 0
    for group in (batches[:4], batches[4:]):
        stacked = {k: jnp.stack([b[k] for b in group]) for k in group[0]}
        g2, d2, acc2, auxs, d_losses = steps.megastep(
            g2, d2, acc2, frozen, stacked, key, d_base, step, step)
        mega_aux.extend(
            (float(auxs["loss"][i]), float(d_losses[i]))
            for i in range(len(group)))
        step += len(group)

    for (a, da), (b, db) in zip(ref_aux, mega_aux):
        assert abs(a - b) < 1e-5, "per-batch G losses diverge"
        assert abs(da - db) < 1e-5, "per-batch D losses diverge"
    # Param tolerance: scan vs straight-line XLA programs round differently
    # in the last bit, and Adam's sign-normalizing update turns a last-bit
    # grad difference into an O(lr)=1e-4 param difference — so the bound is
    # Adam's per-step scale, not float epsilon. (On the TPU backend the two
    # trajectories are bit-identical; CPU fusion differs.)
    for t1, t2 in zip(jax.tree.leaves(g1.params), jax.tree.leaves(g2.params)):
        assert jnp.allclose(t1, t2, atol=2e-4), "G params diverge"
    for t1, t2 in zip(jax.tree.leaves(d1.params), jax.tree.leaves(d2.params)):
        assert jnp.allclose(t1, t2, atol=2e-4), "D params diverge"
    for t1, t2 in zip(jax.tree.leaves(acc1), jax.tree.leaves(acc2)):
        assert jnp.allclose(t1, t2, atol=1e-5), "D-grad accumulators diverge"


def test_megabatches_grouping_preserves_order_and_tail():
    mk = lambda i: Batch({"x": np.full((B, L), i, np.int32)}, valid=B)
    groups = list(MegaBatches([mk(i) for i in range(N_BATCHES)], 4))
    assert len(groups) == 2
    assert groups[0].arrays["x"].shape == (4, B, L)
    assert groups[1].arrays["x"].shape == (2, B, L)  # tail at true size
    np.testing.assert_array_equal(groups[0].arrays["x"][:, 0, 0],
                                  np.arange(4))
    np.testing.assert_array_equal(groups[1].arrays["x"][:, 0, 0],
                                  np.array([4, 5]))
    assert groups[0].valid == 4 * B and groups[1].valid == 2 * B
    assert len(MegaBatches([mk(i) for i in range(N_BATCHES)], 4)) == 2
