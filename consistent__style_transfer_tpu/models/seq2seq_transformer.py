"""Transformer seq2seq generator — the stretch backbone (BASELINE.json
configs[4]: "swap backbone to T5-small + beam decode, data-parallel over
v4-8"). T5-small dimensions (d=512, 8 heads, 6+6 layers, ff 2048), pre-LN,
learned positions, style conditioning by adding the style embedding to every
encoder-input / decoder-input token embedding — the transformer analogue of
the LSTM generator's style-initialized states (``src/model/rnn.py:57,67-69``).

TPU shape:
- teacher-forced training (``mode="sched"`` with x) is ONE parallel causal
  pass — no scan at all, the decisive win over per-token decode;
- autoregressive modes run through :func:`generate`, a ``lax.scan`` whose
  body is one KV-cached ``decode_step`` apply — each step attends into a
  preallocated (B, L, h, hd) cache (dynamic_update_slice), so per-step work
  is O(L·d) instead of re-running the prefix;
- ``mode="st"`` feeds the straight-through sample back through the embedding
  table and returns probs (GAN-stage contract);
- :func:`beam_decode` adds length-normalized beam search over the fixed
  ``max_len`` rollout (corpus transfers are fixed-length, like the
  reference's test path).

Use via ``Config.backbone = "transformer"`` — the stage drivers dispatch
through :func:`train.common.generator_call`.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.sampling import hard_sample_st
from .initializers import embedding_init, linear_bias_init, linear_kernel_init, xavier_uniform

D_MODEL = 512
N_HEADS = 8
N_ENC = 6
N_DEC = 6
D_FF = 2048
MAX_POS = 128
HEAD_DIM = D_MODEL // N_HEADS


def _dense(features, name, d_in):
    return nn.Dense(features, kernel_init=linear_kernel_init,
                    bias_init=linear_bias_init(d_in), name=name)


class _MHA(nn.Module):
    """Multi-head attention; with ``cache``+``cache_index`` it runs one-query
    cached decode (writes K/V of the current step, attends over the prefix)."""

    @nn.compact
    def __call__(self, q_in, kv_in, mask=None, cache=None, cache_index=None):
        d, h, hd = D_MODEL, N_HEADS, HEAD_DIM
        q = _dense(d, "q", d)(q_in)
        k = _dense(d, "k", d)(kv_in)
        v = _dense(d, "v", d)(kv_in)

        def heads(x):
            return x.reshape(x.shape[0], x.shape[1], h, hd)

        q, k, v = heads(q), heads(k), heads(v)
        if cache is not None:
            ck = jax.lax.dynamic_update_slice(cache["k"], k, (0, cache_index, 0, 0))
            cv = jax.lax.dynamic_update_slice(cache["v"], v, (0, cache_index, 0, 0))
            k, v = ck, cv
            L = k.shape[1]
            pos = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, L), 3)
            step_mask = pos <= cache_index
            mask = step_mask if mask is None else (mask & step_mask)
            cache = {"k": ck, "v": cv}
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(jnp.float32(hd))
        if mask is not None:
            scores = jnp.where(mask, scores, -1e30)
        attn = nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v)
        out = out.reshape(out.shape[0], out.shape[1], d)
        return _dense(d, "out", d)(out), cache


class _FFN(nn.Module):
    @nn.compact
    def __call__(self, x):
        y = _dense(D_FF, "wi", D_MODEL)(x)
        return _dense(D_MODEL, "wo", D_FF)(nn.relu(y))


class _EncLayer(nn.Module):
    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(name="ln1")(x)
        a, _ = _MHA(name="attn")(h, h)
        x = x + a
        x = x + _FFN(name="ffn")(nn.LayerNorm(name="ln2")(x))
        return x


class _DecLayer(nn.Module):
    @nn.compact
    def __call__(self, x, memory, self_mask=None, cache=None, cache_index=None):
        h = nn.LayerNorm(name="ln1")(x)
        a, cache = _MHA(name="self_attn")(h, h, mask=self_mask, cache=cache,
                                          cache_index=cache_index)
        x = x + a
        h = nn.LayerNorm(name="ln2")(x)
        c, _ = _MHA(name="cross_attn")(h, memory)
        x = x + c
        x = x + _FFN(name="ffn")(nn.LayerNorm(name="ln3")(x))
        return x, cache


class TransformerSeq2Seq(nn.Module):
    n_vocab: int
    n_class: int
    max_len: int
    p_drop: float = 0.1
    dtype: jnp.dtype = jnp.float32
    remat: bool = False  # constructor parity with DenoiseSeq2Seq

    def setup(self):
        self.token_embedding = nn.Embed(self.n_vocab, D_MODEL,
                                        embedding_init=embedding_init)
        self.posit_embedding = nn.Embed(MAX_POS, D_MODEL,
                                        embedding_init=xavier_uniform)
        self.style_embedding = nn.Embed(self.n_class, D_MODEL,
                                        embedding_init=xavier_uniform)
        self.start_embedding = nn.Embed(1, D_MODEL,
                                        embedding_init=embedding_init)
        self.lm_head = nn.Dense(self.n_vocab, use_bias=False,
                                kernel_init=linear_kernel_init)
        self.enc_layers = [_EncLayer(name=f"enc_{i}") for i in range(N_ENC)]
        self.dec_layers = [_DecLayer(name=f"dec_{i}") for i in range(N_DEC)]
        self.enc_norm = nn.LayerNorm()
        self.dec_norm = nn.LayerNorm()
        self.drop = nn.Dropout(self.p_drop)

    # ------------------------------------------------------------- components
    def _embed_inp(self, inp):
        if jnp.issubdtype(inp.dtype, jnp.integer):
            return self.token_embedding(inp)
        return hard_sample_st(inp) @ self.token_embedding.embedding

    def encode(self, inp, label_i, deterministic: bool = True):
        e = self._embed_inp(inp)
        L = e.shape[1]
        e = e + self.posit_embedding(jnp.arange(L))[None] \
              + self.style_embedding(label_i)[:, None, :]
        e = self.drop(e, deterministic=deterministic)
        for layer in self.enc_layers:
            e = layer(e)
        return self.enc_norm(e)

    def bos(self, B):
        return self.start_embedding(jnp.zeros((B,), jnp.int32))[:, None, :]

    def embed_ids(self, ids):
        return self.token_embedding(ids)

    def decode_teacher(self, memory, x, label, deterministic: bool = True):
        """Parallel causal pass; inputs shifted right with BOS."""
        B, L = x.shape
        tgt_in = jnp.concatenate([self.bos(B), self.token_embedding(x[:, :-1])], 1)
        h = tgt_in + self.posit_embedding(jnp.arange(L))[None] \
                   + self.style_embedding(label)[:, None, :]
        h = self.drop(h, deterministic=deterministic)
        causal = jnp.tril(jnp.ones((L, L), bool))[None, None]
        for layer in self.dec_layers:
            h, _ = layer(h, memory, self_mask=causal)
        return self.lm_head(self.dec_norm(h))

    def decode_step(self, prev_emb, t, caches, memory, label,
                    deterministic: bool = True):
        """One cached decode step. prev_emb (B, 1, D); caches: list per layer
        of {"k","v"} (B, L, h, hd). Returns (logits (B, V), new caches)."""
        h = prev_emb + self.posit_embedding(t)[None, None, :] \
                     + self.style_embedding(label)[:, None, :]
        h = self.drop(h, deterministic=deterministic)
        new_caches = []
        for layer, cache in zip(self.dec_layers, caches):
            h, cache = layer(h, memory, cache=cache, cache_index=t)
            new_caches.append(cache)
        return self.lm_head(self.dec_norm(h)[:, 0]), new_caches

    # ------------------------------------------------------------ entry point
    def __call__(
        self,
        inp: jnp.ndarray,
        label_i: jnp.ndarray,
        x: Optional[jnp.ndarray],
        label: jnp.ndarray,
        mode: str = "sched",
        tau: float = 1.0,
        deterministic: bool = False,
    ):
        """Teacher-forced path (mode="sched" with x) runs here directly; the
        autoregressive modes (x=None / "st" / "greedy") go through
        :func:`generate`, which drives `decode_step` under `lax.scan`. During
        init this traces both paths once so every param exists."""
        memory = self.encode(inp, label_i, deterministic)
        if x is not None and mode == "sched":
            return self.decode_teacher(memory, x, label, deterministic)
        if self.is_initializing():
            B = memory.shape[0]
            caches = init_caches(B, self.max_len)
            logits0, _ = self.decode_step(self.bos(B), jnp.int32(0), caches,
                                          memory, label, deterministic)
            # also trace the teacher path so both share one param set
            dummy_x = jnp.zeros((B, self.max_len), jnp.int32)
            self.decode_teacher(memory, dummy_x, label, deterministic)
            if mode == "greedy":
                return jnp.zeros((B, self.max_len), jnp.int32)
            return jnp.broadcast_to(logits0[:, None, :],
                                    (B, self.max_len, self.n_vocab))
        raise ValueError(
            "autoregressive modes require models.seq2seq_transformer.generate()"
        )


def init_caches(B: int, L: int):
    return [
        {"k": jnp.zeros((B, L, N_HEADS, HEAD_DIM)),
         "v": jnp.zeros((B, L, N_HEADS, HEAD_DIM))}
        for _ in range(N_DEC)
    ]


def generate(model: TransformerSeq2Seq, params, inp, label_i, label,
             mode: str = "greedy", tau: float = 1.0, rngs=None,
             deterministic: bool = True, L_out: int | None = None):
    """Autoregressive decode: lax.scan over KV-cached decode steps.

    Returns probs (B, L, V) for mode="st", logits for mode="sched" (greedy
    feedback — the x=None branch of the reference semantics), ids (B, L) for
    mode="greedy". Fully differentiable (the ST feedback path backprops
    through the whole scan)."""
    assert mode in ("st", "sched", "greedy")
    L = model.max_len if L_out is None else L_out
    enc_rngs = rngs
    memory = model.apply(params, inp, label_i, deterministic,
                         method=TransformerSeq2Seq.encode, rngs=enc_rngs)
    B = memory.shape[0]
    x0 = model.apply(params, B, method=TransformerSeq2Seq.bos)
    emb_table = params["params"]["token_embedding"]["embedding"]
    base_key = None if rngs is None else rngs.get("dropout")

    def body(carry, t):
        prev_emb, caches = carry
        step_rngs = None
        if base_key is not None and not deterministic:
            step_rngs = {"dropout": jax.random.fold_in(base_key, t)}
        logits_t, caches = model.apply(
            params, prev_emb, t, caches, memory, label, deterministic,
            method=TransformerSeq2Seq.decode_step, rngs=step_rngs,
        )
        if mode == "st":
            probs_t = jax.nn.softmax(logits_t / tau, -1)
            nxt = (hard_sample_st(probs_t) @ emb_table)[:, None, :]
            out = probs_t
        else:
            ids_t = jnp.argmax(logits_t, -1).astype(jnp.int32)
            nxt = jnp.take(emb_table, ids_t, axis=0)[:, None, :]
            out = ids_t if mode == "greedy" else logits_t
        return (nxt, caches), out

    (_, _), outs = jax.lax.scan(body, (x0, init_caches(B, L)), jnp.arange(L))
    return jnp.swapaxes(outs, 0, 1)


def beam_decode(model: TransformerSeq2Seq, params, x, label_i, tgt_label,
                beam_size: int = 4, length_penalty: float = 0.6):
    """Length-normalized beam search over the fixed max_len rollout via
    teacher-forced rescoring of growing prefixes (O(L) parallel causal passes
    — fully batched/MXU-friendly at L<=30). Returns (ids (B, L), scores (B,))."""
    B = x.shape[0]
    L = model.max_len
    V = model.n_vocab

    x_rep = jnp.repeat(x, beam_size, 0)
    li_rep = jnp.repeat(label_i, beam_size, 0)
    tl_rep = jnp.repeat(tgt_label, beam_size, 0)

    def next_logp(prefix_padded, t, xs, lis, tls):
        logits = model.apply(params, xs, lis, prefix_padded, tls,
                             mode="sched", deterministic=True)
        return jax.nn.log_softmax(logits[:, t])

    # step 0 over the un-expanded batch
    logp0 = next_logp(jnp.zeros((B, L), jnp.int32), 0, x, label_i, tgt_label)
    scores, ids0 = jax.lax.top_k(logp0, beam_size)            # (B, beam)
    prefixes = jnp.zeros((B * beam_size, L), jnp.int32)
    prefixes = prefixes.at[:, 0].set(ids0.reshape(-1))
    scores = scores.reshape(B * beam_size)

    for t in range(1, L):
        logp = next_logp(prefixes, t, x_rep, li_rep, tl_rep)  # (B*beam, V)
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
    return jnp.take_along_axis(out, best[:, None, None], 1)[:, 0], \
        jnp.take_along_axis(norm, best[:, None], 1)[:, 0]
