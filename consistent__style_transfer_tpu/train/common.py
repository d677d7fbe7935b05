"""Shared stage plumbing: artifact resolution (tokenizer, word2vec), corpus
loading, model construction, mesh setup."""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from ..config import Config
from ..data.corpus import StyleCorpus
from ..models import (
    DenoiseSeq2Seq,
    PairMatcher,
    RelGANDiscriminator,
    TextCNN,
    TransformerLM,
)
from ..parallel.mesh import make_mesh
from ..text.bpe import BPETokenizer
from ..text.word2vec import Word2Vec, train_token_w2v


def compute_dtype(cfg: Config):
    return jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32


def get_tokenizer(cfg: Config, prefer_native: bool = True):
    """Load the dataset tokenizer, training it first if the dump is missing
    (reference ``src/vocab.py:50-65`` CLI behavior). When the C++ runtime is
    built (``make -C native``), encode/decode run through it (same tables,
    verified equivalent in tests/test_native.py)."""
    from ..text import native as nat

    native_ok = prefer_native and (nat.available() or nat.build())
    vocab_path, merges_path = cfg.vocab_paths
    if not (os.path.exists(vocab_path) and os.path.exists(merges_path)):
        if native_ok:
            vocab, merges = nat.native_bpe_train(cfg.train_files(), cfg.vocab_size)
            tok = BPETokenizer(vocab, merges)
        else:
            tok = BPETokenizer.train(cfg.train_files(), cfg.vocab_size)
        tok.save(cfg.ds_dump_dir, cfg.dataset)
    tok = BPETokenizer.load(vocab_path, merges_path)
    if native_ok:
        return nat.NativeBPE.from_python(tok)
    return tok


def get_w2v(cfg: Config, tokenizer) -> Word2Vec:
    """Load the WMD word2vec, training it first if missing (reference
    ``src/wmd.py:58-75``); vectors normalized like ``init_sims(replace=True)``."""
    if not os.path.exists(cfg.w2v_path):
        w2v = train_token_w2v(cfg.train_files(), tokenizer, epochs=10, seed=cfg.seed)
        w2v.save(cfg.w2v_path)
    w2v = Word2Vec.load(cfg.w2v_path)
    w2v.init_sims()
    return w2v


def get_corpus(cfg: Config, split: str, tokenizer) -> StyleCorpus:
    return StyleCorpus.from_files(cfg.split_files(split), tokenizer, cfg.max_len)


def get_mesh(cfg: Config):
    return make_mesh(cfg.mesh.n_data, cfg.mesh.n_model)


def build_generator(cfg: Config, n_vocab: int):
    kw = dict(n_vocab=n_vocab, n_class=cfg.n_class, max_len=cfg.max_len,
              p_drop=cfg.p_drop, dtype=compute_dtype(cfg), remat=cfg.remat_decode)
    if cfg.backbone == "transformer":
        from ..models.seq2seq_transformer import TransformerSeq2Seq

        return TransformerSeq2Seq(**kw)
    assert cfg.backbone == "lstm", cfg.backbone
    # The Pallas fused decode head is an experiment, not a production path:
    # measured within noise of XLA's own fusion at every (V, dtype) regime
    # probed (benchmarks/bench_decode_head.py; RESULTS.md "Pallas verdict"),
    # so the model default (use_pallas=False) is always used here.
    return DenoiseSeq2Seq(rep_penalty=cfg.rep_penalty, **kw)


def generator_call(model, params, inp, label_i, x, label, mode="sched",
                   tau=1.0, deterministic=True, rngs=None,
                   time_major_out=False):
    """Backbone-agnostic generator invocation with the reference call
    semantics (inp, input-style, teacher x, output-style, decode mode). The
    LSTM backbone handles every mode inside one apply; the transformer
    backbone's autoregressive modes run the KV-cached lax.scan driver.

    ``time_major_out``: return SOFT outputs as (L, B, V) — the LSTM scan's
    native stack layout, skipping its 92 MB (B, L, V) relayout (see
    ``DenoiseSeq2Seq.__call__``). Integer id outputs are always batch-major
    under BOTH backbones (the ids transpose is tiny, so the flag never
    changes their layout). The transformer backbone decodes batch-major
    natively, so there the soft case is emulated with a swapaxes (only for
    layout-contract consistency; ``Config.time_major_probs`` is an LSTM
    optimization and stays off for the transformer backbone)."""
    from ..models.seq2seq_transformer import TransformerSeq2Seq, generate

    if isinstance(model, TransformerSeq2Seq):
        if mode == "sched" and x is not None:
            out = model.apply(params, inp, label_i, x, label, mode="sched",
                              deterministic=deterministic, rngs=rngs)
        else:
            L_out = None if x is None else x.shape[1]
            out = generate(model, params, inp, label_i, label, mode=mode,
                           tau=tau, rngs=rngs, deterministic=deterministic,
                           L_out=L_out)
        if time_major_out and out.ndim == 3:
            out = jnp.swapaxes(out, 0, 1)
        return out
    return model.apply(params, inp, label_i, x, label, mode=mode, tau=tau,
                       deterministic=deterministic, rngs=rngs,
                       time_major_out=time_major_out)


def build_classifier(cfg: Config, n_vocab: int) -> TextCNN:
    return TextCNN(n_vocab=n_vocab, n_class=cfg.n_class, dtype=compute_dtype(cfg))


def _scorer_size_kw(cfg: Config) -> dict:
    """Optional Matcher/LM size overrides (Config.scorer_*); empty dict keeps
    the reference dims baked into the model defaults."""
    kw = {}
    if cfg.scorer_layers is not None:
        kw["n_layers"] = cfg.scorer_layers
    if cfg.scorer_d_model is not None:
        kw["d_model"] = cfg.scorer_d_model
    if cfg.scorer_heads is not None:
        kw["n_heads"] = cfg.scorer_heads
    return kw


def build_matcher(cfg: Config, n_vocab: int) -> PairMatcher:
    return PairMatcher(n_vocab=n_vocab, dtype=compute_dtype(cfg),
                       remat=cfg.remat_scorers, **_scorer_size_kw(cfg))


def build_lm(cfg: Config, n_vocab: int) -> TransformerLM:
    return TransformerLM(n_vocab=n_vocab, n_class=cfg.n_class,
                         dtype=compute_dtype(cfg), remat=cfg.remat_scorers,
                         **_scorer_size_kw(cfg))


def build_discriminator(cfg: Config, n_vocab: int) -> RelGANDiscriminator:
    return RelGANDiscriminator(n_vocab=n_vocab, dtype=compute_dtype(cfg))


def make_key(cfg: Config, seed: int | None = None):
    """Stage-driver base key honoring Config.rng_impl ("rbg" default: TPU
    hardware RngBitGenerator — same-quality dropout/sampling masks, far
    cheaper mask generation than threefry's software bit-mixing; see
    config.py). split/fold_in preserve the impl, so one switch here covers
    every downstream rng."""
    s = cfg.seed if seed is None else seed
    if cfg.rng_impl == "threefry":
        return jax.random.PRNGKey(s)
    return jax.random.key(s, impl=cfg.rng_impl)


def step_rngs(base_key, step: int, names=("dropout", "coin")) -> dict:
    key = jax.random.fold_in(base_key, step)
    keys = jax.random.split(key, len(names))
    return dict(zip(names, keys))
