"""Backbone-agnostic length-normalized beam search over fixed-length
rollouts, by teacher-forced prefix rescoring: the search only needs a
function giving next-token log-probs for a batch of (padded) prefixes —
one parallel causal pass for the transformer, one teacher-forced scan for the
LSTM. O(L) passes total, each fully batched over (B * beam) on the MXU.

Fixed-length transfers (the corpus has no EOS in decode, matching the
reference's test rollout) make this exact w.r.t. the scoring model."""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def beam_search(
    next_logp_fn: Callable[[jnp.ndarray, int, bool], jnp.ndarray],
    B: int,
    L: int,
    V: int,
    beam_size: int = 4,
    length_penalty: float = 0.6,
):
    """next_logp_fn(prefix_padded (N, L), t, expanded) -> (N, V) log-probs of
    token t+0 given prefix[:, :t]; `expanded` says whether N = B*beam (True)
    or N = B (the t=0 call). Returns (ids (B, L), scores (B,))."""
    logp0 = next_logp_fn(jnp.zeros((B, L), jnp.int32), 0, False)
    scores, ids0 = jax.lax.top_k(logp0, beam_size)            # (B, beam)
    prefixes = jnp.zeros((B * beam_size, L), jnp.int32)
    prefixes = prefixes.at[:, 0].set(ids0.reshape(-1))
    scores = scores.reshape(B * beam_size)

    for t in range(1, L):
        logp = next_logp_fn(prefixes, t, True)                # (B*beam, V)
        total = (scores[:, None] + logp).reshape(B, beam_size * V)
        scores_new, flat_idx = jax.lax.top_k(total, beam_size)
        beam_idx = flat_idx // V
        tok_idx = flat_idx % V
        src = prefixes.reshape(B, beam_size, L)
        gathered = jnp.take_along_axis(src, beam_idx[:, :, None], axis=1)
        prefixes = gathered.at[:, :, t].set(tok_idx).reshape(B * beam_size, L)
        scores = scores_new.reshape(B * beam_size)

    norm = (scores / (L ** length_penalty)).reshape(B, beam_size)
    best = jnp.argmax(norm, axis=1)
    out = prefixes.reshape(B, beam_size, L)
    return (
        jnp.take_along_axis(out, best[:, None, None], 1)[:, 0],
        jnp.take_along_axis(norm, best[:, None], 1)[:, 0],
    )


def beam_decode_any(model, params, x, label_i, tgt_label,
                    beam_size: int = 4, length_penalty: float = 0.6):
    """Beam decode for either generator backbone.

    LSTM backbone: stateful beam (``BeamDenoiseSeq2Seq`` — one encoder pass +
    L single-token decoder steps with carried (h, c) per beam) sharing the
    trained params by module-name identity. Transformer backbone:
    prefix-rescoring via :func:`beam_search` (one parallel causal pass per
    step — already the right shape for full attention)."""
    from ..train.common import generator_call
    from .generator import BeamDenoiseSeq2Seq, DenoiseSeq2Seq
    from .seq2seq_transformer import TransformerSeq2Seq

    if isinstance(model, DenoiseSeq2Seq) and not isinstance(
            model, TransformerSeq2Seq):
        beam_model = BeamDenoiseSeq2Seq(
            n_vocab=model.n_vocab, n_class=model.n_class,
            max_len=model.max_len, p_drop=model.p_drop, dtype=model.dtype,
            beam_size=beam_size, length_penalty=length_penalty)
        return beam_model.apply(params, x, label_i, tgt_label)

    B, L = x.shape[0], model.max_len
    V = model.n_vocab
    x_rep = jnp.repeat(x, beam_size, 0)
    li_rep = jnp.repeat(label_i, beam_size, 0)
    tl_rep = jnp.repeat(tgt_label, beam_size, 0)

    teacher_mode = "sched" if isinstance(model, TransformerSeq2Seq) else "teacher"

    def next_logp(prefix, t, expanded):
        xs = x_rep if expanded else x
        lis = li_rep if expanded else label_i
        tls = tl_rep if expanded else tgt_label
        logits = generator_call(model, params, xs, lis, prefix, tls,
                                mode=teacher_mode, deterministic=True)
        return jax.nn.log_softmax(logits[:, t])

    return beam_search(next_logp, B, L, V, beam_size, length_penalty)
