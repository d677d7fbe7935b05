"""Padded eval batches must score identically to their unpadded equivalents.

The pipeline pads the last partial eval batch by repeating index 0
(``data/pipeline.py::_batch_indices``); ``eval_arrays`` attaches a ``row_mask``
and the val steps compute masked means, so the duplicated rows cannot bias
model selection (the reference validates over ragged batches,
``src/main_optimize.py:127-141`` — masked means restore those semantics under
static shapes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from consistent__style_transfer_tpu.config import make_config
from consistent__style_transfer_tpu.data.corpus import StyleCorpus
from consistent__style_transfer_tpu.data.pipeline import eval_arrays, make_batches
from consistent__style_transfer_tpu.train.optimize import (
    OptimizeModels,
    make_optimize_steps,
)
from consistent__style_transfer_tpu.train.pretrain import make_pretrain_steps
from consistent__style_transfer_tpu.train.common import (
    build_classifier,
    build_lm,
    build_matcher,
)

V = 50
L = 8


def _tree_close(a, b, tol=1e-5):
    return abs(float(a) - float(b)) <= tol


@pytest.fixture(scope="module")
def opt_setup():
    cfg = make_config("tiny")
    cfg.max_len = L
    models = OptimizeModels(cfg, V)
    key = jax.random.PRNGKey(0)
    kc, km, kn, kg = jax.random.split(key, 4)
    x0 = jnp.zeros((2, L), jnp.int32)
    n0 = jnp.zeros((2, L + L // 2), jnp.int32)
    l0 = jnp.zeros((2,), jnp.int32)
    frozen = {
        "cls": models.classifier.init(kc, x0),
        "mat": models.matcher.init(km, n0, n0),
        "nt": models.nt_checker.init(kn, x0),
    }
    g_params = models.generator.init(kg, x0, l0, None, l0, deterministic=True)
    steps = make_optimize_steps(cfg, models)
    return cfg, frozen, g_params, steps


@pytest.mark.slow
def test_optimize_val_masks_padded_rows(opt_setup):
    cfg, frozen, g_params, steps = opt_setup
    rng = np.random.default_rng(3)
    x = rng.integers(3, V, (3, L)).astype(np.int32)
    labels = np.array([0, 1, 0], np.int32)
    # padded variant: row 0 duplicated to fill B=5
    xp = np.concatenate([x, x[[0, 0]]], axis=0)
    lp = np.concatenate([labels, labels[[0, 0]]])
    mask = np.array([1, 1, 1, 0, 0], np.float32)

    clean = steps.val_step(g_params, frozen, {"x": jnp.asarray(x),
                                              "labels": jnp.asarray(labels)})
    masked = steps.val_step(g_params, frozen, {"x": jnp.asarray(xp),
                                               "labels": jnp.asarray(lp),
                                               "row_mask": jnp.asarray(mask)})
    assert _tree_close(clean, masked)
    # and the unmasked padded batch is genuinely different (the bias existed)
    polluted = steps.val_step(g_params, frozen, {"x": jnp.asarray(xp),
                                                 "labels": jnp.asarray(lp)})
    assert not _tree_close(clean, polluted, tol=1e-7)


@pytest.mark.slow
def test_pretrain_eval_masks_padded_rows():
    cfg = make_config("tiny")
    cfg.max_len = L
    models = {"cls": build_classifier(cfg, V), "mat": build_matcher(cfg, V),
              "dn": build_lm(cfg, V)}
    key = jax.random.PRNGKey(1)
    kc, km, kd = jax.random.split(key, 3)
    x0 = jnp.zeros((2, L), jnp.int32)
    n0 = jnp.zeros((2, L + L // 2), jnp.int32)
    params = {"cls": models["cls"].init(kc, x0),
              "mat": models["mat"].init(km, n0, n0),
              "dn": models["dn"].init(kd, x0)}
    _, eval_step = make_pretrain_steps(models)

    rng = np.random.default_rng(5)
    Ln = L + L // 2
    batch3 = {
        "x": rng.integers(3, V, (3, L)).astype(np.int32),
        "nx1": rng.integers(3, V, (3, Ln)).astype(np.int32),
        "nx2": rng.integers(3, V, (3, Ln)).astype(np.int32),
        "nx3": rng.integers(3, V, (3, L)).astype(np.int32),
        "labels": np.array([0, 1, 1], np.int32),
        "wmd": rng.uniform(0, 2, 3).astype(np.float32),
    }
    batch5 = {k: np.concatenate([v, v[[0, 0]]], axis=0) for k, v in batch3.items()}
    batch5["row_mask"] = np.array([1, 1, 1, 0, 0], np.float32)
    flags = (True, True, True)
    clean = eval_step(params, {k: jnp.asarray(v) for k, v in batch3.items()}, flags)
    masked = eval_step(params, {k: jnp.asarray(v) for k, v in batch5.items()}, flags)
    for t in ("cls", "mat", "dn"):
        assert _tree_close(clean[t], masked[t]), t


def test_eval_arrays_mask_matches_valid():
    corpus = StyleCorpus.from_sentences([[3, 4, 5]] * 7, np.zeros(7, np.int32),
                                        max_len=L)
    it = make_batches(corpus, 4, L, "optimize", shuffle=False)
    batches = list(it)
    assert [b.valid for b in batches] == [4, 3]
    arrays = eval_arrays(batches[1])
    np.testing.assert_array_equal(arrays["row_mask"], [1, 1, 1, 0])
