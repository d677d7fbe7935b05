from consistent__style_transfer_tpu.config import (
    DATASET_PRESETS,
    config_from_args,
    make_config,
)


def test_dataset_presets():
    """Reference src/arguments.py:39-46: yelp -> (18, 256), book -> (30, 128)."""
    yelp = make_config("yelp")
    assert (yelp.max_len, yelp.batch_size) == (18, 256)
    book = make_config("book")
    assert (book.max_len, book.batch_size) == (30, 128)
    assert set(DATASET_PRESETS) == {"yelp", "book"}


def test_reference_loss_weight_defaults():
    cfg = make_config("yelp")
    assert (cfg.w_s, cfg.w_c, cfg.w_adv, cfg.w_bt) == (0.1, 0.5, 1.0, 1.0)
    assert (cfg.tau, cfg.gap, cfg.epochs, cfg.n_class) == (0.1, 0.0, 10, 2)


def test_cli_overrides():
    cfg = config_from_args([
        "--dataset=yelp", "--ver=wo_s", "--w_s=0", "--tau=0.01",
        "--epochs=3", "--backbone=transformer", "--n_model=2",
    ])
    assert cfg.ver == "wo_s"
    assert cfg.w_s == 0.0
    assert cfg.tau == 0.01
    assert cfg.epochs == 3
    assert cfg.backbone == "transformer"
    assert cfg.mesh.n_model == 2
    # preset still applies under overrides
    assert cfg.max_len == 18


def test_derived_paths():
    cfg = make_config("yelp", ver="v1")
    assert cfg.vocab_paths[0].endswith("dump/yelp/yelp-vocab.json")
    assert cfg.run_out_dir.endswith("output/yelp-v1")
    assert cfg.split_files("dev") == ["data/yelp/style.dev.0", "data/yelp/style.dev.1"]


def test_named_presets():
    """PRESETS ships measured operating points (RESULTS.md "NT-band control"):
    ref_band = the band-matching recipe (w_s 0.0075, decayed masked copy)."""
    import dataclasses

    import pytest

    from consistent__style_transfer_tpu.config import PRESETS, Config

    cfg = make_config("yelp", preset="ref_band")
    assert (cfg.w_s, cfg.w_copy, cfg.w_copy_decay) == (0.0075, 0.4, 0.6)
    assert cfg.warmup_epochs == 2
    # dataset preset still applies underneath the named preset
    assert (cfg.max_len, cfg.batch_size) == (18, 256)
    # explicit overrides win over the named preset
    assert make_config("yelp", preset="ref_band", w_s=0.5).w_s == 0.5
    with pytest.raises(ValueError):
        make_config("yelp", preset="no_such_preset")
    # every preset key must be a real Config field (drift guard)
    fields = {f.name for f in dataclasses.fields(Config)}
    for name, knobs in PRESETS.items():
        assert set(knobs) <= fields, name
    # the CLI flag path reaches the same preset
    assert config_from_args(["--dataset=yelp", "--preset=ref_band"]).w_s == 0.0075


def test_unknown_override_rejected():
    import pytest

    with pytest.raises(ValueError):
        make_config("yelp", nonexistent_knob=1)


def test_make_key_honors_rng_impl():
    # rng_impl="rbg" (production default since round 4) must produce a
    # typed key whose impl survives split/fold_in — one switch in make_key
    # covers every downstream step_rngs derivation. threefry stays
    # bit-compatible with PRNGKey for pre-round-4 artifacts.
    import jax
    import jax.numpy as jnp

    from consistent__style_transfer_tpu.train.common import make_key, step_rngs

    cfg = make_config("tiny")
    assert cfg.rng_impl == "rbg"
    k = make_key(cfg)
    assert jax.random.key_impl(k) == jax.random.key_impl(
        jax.random.key(0, impl="rbg"))
    rngs = step_rngs(k, 3)
    assert set(rngs) == {"dropout", "coin"}
    # derived keys keep the impl and generate usable bits
    assert jax.random.key_impl(rngs["dropout"]) == jax.random.key_impl(k)
    bits = jax.random.uniform(rngs["coin"], (4,))
    assert jnp.all((bits >= 0) & (bits < 1))

    cfg.rng_impl = "threefry"
    k2 = make_key(cfg)
    assert jnp.array_equal(k2, jax.random.PRNGKey(cfg.seed))
