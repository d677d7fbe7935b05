"""Style-conditioned denoising seq2seq generator (TPU-native redesign of the
reference's ``DenoiseLSTM``, ``src/model/rnn.py``).

Architecture parity (dims from ``src/model/rnn.py:11-14``):
- token embedding d=128; encoder = 1-layer BiLSTM hidden=256 whose initial
  hidden state is the *input-style* embedding (``rnn.py:57,62``), initial cell
  is zero;
- decoder = 1-layer LSTM hidden=512, initial h = *target-style* embedding,
  initial c = LeakyReLU(0.1)(W_transfer @ [c_fwd; c_bwd]) (``rnn.py:67-69``);
- per step: dot-product attention of the decoder output over encoder memory
  scaled by sqrt(2*d_enc) (``rnn.py:46-50``), then
  FFN(concat[o_t, a_t]) -> LeakyReLU(0.1) -> vocab logits (``rnn.py:78-80``).

TPU redesign: the reference's per-token Python decode loop (``rnn.py:72-97``)
— the wall-clock bottleneck of its optimize stage — is a single ``nn.scan``
over a static ``max_len``, so the whole rollout (including the
straight-through feedback path of the GAN stage) compiles into one XLA while
loop with MXU-sized matmuls. Gate layout matches torch LSTM (i, f, g, o) so
checkpoints can interop with the reference (utils/torch_interop.py).

Decode modes (reference ``rnn.py:82-96``):
- ``mode="st"``: differentiable decode — temperature softmax(tau), straight-
  through hard sample fed back through the embedding table; returns *probs*.
- ``mode="sched"``: scheduled sampling — per-step global coin picks teacher
  forcing (p=1/2) vs greedy feedback; returns logits. With ``x=None`` this is
  pure greedy decode over ``max_len`` steps.

Soft-distribution *encoder* inputs (B, L, V) take the straight-through
hard-sample path of ``rnn.py:52-53,61``.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.sampling import hard_sample_st
from .initializers import embedding_init, linear_bias_init, linear_kernel_init, lstm_init
from .transformer import embed_or_project

D_EMBED = 128
D_ENC = 256
D_DEC = 512
P_DROP = 0.1


class LSTMCell(nn.Module):
    """Minimal LSTM cell with torch gate order (i, f, g, o) and
    U(±1/sqrt(hidden)) init."""

    hidden: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, carry, x):
        h, c = carry
        init = lstm_init(self.hidden)
        gates = nn.Dense(4 * self.hidden, kernel_init=init, bias_init=init,
                         dtype=self.dtype, name="ih")(x)
        gates = gates + nn.Dense(4 * self.hidden, kernel_init=init,
                                 bias_init=init, dtype=self.dtype, name="hh")(h)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = nn.sigmoid(f) * c + nn.sigmoid(i) * jnp.tanh(g)
        h = nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), h


class _EncoderScan(nn.Module):
    hidden: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, h0, xs):
        """xs: (B, L, E); returns memory (B, L, H) and final (h, c)."""
        scan = nn.scan(
            LSTMCell,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=1,
            out_axes=1,
        )
        c0 = jnp.zeros_like(h0)
        (h, c), ys = scan(self.hidden, self.dtype, name="cell")((h0, c0), xs)
        return ys, (h, c)


class _Affine(nn.Module):
    """Dense with externally readable weights — same param layout as nn.Dense
    (kernel[, bias]) so checkpoints are interchangeable, but the raw arrays
    are accessible for fused Pallas heads."""

    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def weights(self, d_in: int):
        k = self.param("kernel", linear_kernel_init, (d_in, self.features))
        if not self.use_bias:
            return k.astype(self.dtype), None
        b = self.param("bias", linear_bias_init(d_in), (self.features,))
        return k.astype(self.dtype), b.astype(self.dtype)

    def __call__(self, x):
        k, b = self.weights(x.shape[-1])
        y = x @ k
        return y if b is None else y + b


class _DecoderStep(nn.Module):
    """One decode step; scanned over time by `nn.scan` with per-step dropout
    RNGs. Carry holds (h, c, x_t); xs holds (teacher_embed_t, coin_t).
    ``memory`` (B, L, 2*D_ENC) and ``emb_table`` (V, E) are loop-invariant
    and passed as ``nn.broadcast`` inputs rather than through the carry:
    lax.scan re-threads every carry leaf through the while loop each step,
    which showed up as ~13% of fused-step device time in loop-carry layout
    copies (RESULTS.md round-3 profile) for these two large invariants.

    With ``use_pallas`` (greedy mode, TPU), the FFN -> vocab-projection ->
    argmax head runs as the fused vocab-tiled Pallas kernel
    (kernels/decode_step.py) instead of materializing (B, V) logits."""

    n_vocab: int
    mode: str  # "st" | "sched" | "greedy"
    tau: float
    p_drop: float
    deterministic: bool
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False
    pallas_interpret: bool = False
    rep_penalty: float = 0.0  # greedy decode: subtract alpha*count(token)

    @nn.compact
    def __call__(self, carry, xs, memory, emb_table):
        counts = None
        if self.mode == "greedy" and self.rep_penalty > 0:
            h, c, x_t, counts = carry
        else:
            h, c, x_t = carry
        teacher_emb, coin = xs

        (h, c), o_t = LSTMCell(D_DEC, self.dtype, name="cell")((h, c), x_t)

        # dot-product attention over encoder memory (scale sqrt(2*d_enc))
        scores = jnp.einsum("bd,bld->bl", o_t, memory) / jnp.sqrt(
            jnp.asarray(memory.shape[-1], self.dtype)
        )
        a_t = jnp.einsum("bl,bld->bd", nn.softmax(scores, axis=-1), memory)

        i_ffn = jnp.concatenate([o_t, a_t], axis=-1)
        i_ffn = nn.Dropout(self.p_drop)(i_ffn, deterministic=self.deterministic)
        fn_1 = _Affine(D_DEC, dtype=self.dtype, name="fn_1")
        fn_2 = _Affine(self.n_vocab, use_bias=False, dtype=self.dtype, name="fn_2")

        if self.mode == "greedy" and self.use_pallas:
            from ..kernels.decode_step import fused_decode_logits

            w1, b1 = fn_1.weights(i_ffn.shape[-1])
            w2, _ = fn_2.weights(D_DEC)
            ids_t, _h = fused_decode_logits(i_ffn, w1, b1, w2,
                                            interpret=self.pallas_interpret)
            x_next = jnp.take(emb_table, ids_t, axis=0)
            x_next = nn.Dropout(self.p_drop)(x_next, deterministic=self.deterministic)
            return (h, c, x_next), ids_t

        logits_t = fn_2(nn.leaky_relu(fn_1(i_ffn), 0.1))

        if self.mode == "st":
            probs_t = nn.softmax(logits_t / self.tau, axis=-1)
            x_next = hard_sample_st(probs_t) @ emb_table
            out_t = probs_t
        elif self.mode == "gumbel":
            # the reference's commented-out gumbel variant (rnn.py:86-89),
            # used by its early "gumbel + mle" experiment (exp_log.md):
            # gumbel-softmax relaxation, straight-through feedback
            g = jax.random.gumbel(self.make_rng("gumbel"), logits_t.shape,
                                  logits_t.dtype)
            probs_t = nn.softmax((logits_t + g) / self.tau, axis=-1)
            x_next = hard_sample_st(probs_t) @ emb_table
            out_t = probs_t
        elif self.mode == "greedy":
            # inference fast path: the scan emits only token ids, so no
            # (L, B, V) logits stack ever reaches HBM
            if counts is not None:
                # additive repetition penalty on already-emitted tokens
                # (decode-time degeneracy control; no reference equivalent —
                # its greedy decode shows "just just just" loops on weak DAEs)
                logits_t = logits_t - self.rep_penalty * counts
            ids_t = jnp.argmax(logits_t, axis=-1).astype(jnp.int32)
            if counts is not None:
                # count only content tokens (ids >= 3): PAD/BOS/EOS must stay
                # free to repeat so sentence padding is unaffected
                hot = jax.nn.one_hot(ids_t, self.n_vocab, dtype=counts.dtype)
                counts = counts + hot * (ids_t >= 3)[:, None]
            x_next = jnp.take(emb_table, ids_t, axis=0)
            out_t = ids_t
        elif self.mode == "teacher":
            # always-teacher-forced (deterministic; used by beam rescoring)
            x_next = teacher_emb
            out_t = logits_t
        else:
            greedy = jnp.take(emb_table, jnp.argmax(logits_t, axis=-1), axis=0)
            x_next = jnp.where(coin, teacher_emb, greedy)
            out_t = logits_t
        x_next = nn.Dropout(self.p_drop)(x_next, deterministic=self.deterministic)
        if counts is not None:
            return (h, c, x_next, counts), out_t
        return (h, c, x_next), out_t


class DenoiseSeq2Seq(nn.Module):
    n_vocab: int
    n_class: int
    max_len: int
    p_drop: float = P_DROP
    dtype: jnp.dtype = jnp.float32
    remat: bool = False
    use_pallas: bool = False        # fused decode head in greedy mode (TPU)
    pallas_interpret: bool = False  # interpret-mode kernels (CPU tests)
    rep_penalty: float = 0.0        # greedy decode repetition penalty (alpha)

    @nn.compact
    def __call__(
        self,
        inp: jnp.ndarray,
        label_i: jnp.ndarray,
        x: Optional[jnp.ndarray],
        label: jnp.ndarray,
        mode: str = "sched",
        tau: float = 1.0,
        deterministic: bool = False,
        time_major_out: bool = False,
    ) -> jnp.ndarray:
        """Returns (B, L_out, V): probs when mode="st", logits when "sched";
        mode="greedy" returns token ids (B, L_out) directly (inference fast
        path — no logits stack); mode="gumbel" is the reference's commented
        gumbel-softmax variant (probs out, needs a "gumbel" rng). L_out =
        x.shape[1] when a teacher x is given, else self.max_len (reference
        ``rnn.py:65``); mode="teacher" is fully teacher-forced logits (no
        scheduled-sampling coin; beam rescoring path).

        ``time_major_out=True`` returns the decode scan's native (L_out, B, V)
        stack without the final swapaxes — the (B, L, V) relayout of the soft
        probs is a 92 MB copy per rollout per direction at yelp scale
        (RESULTS.md "copy bucket" item 2); consumers fuse the transpose after
        their V->d embedding projection instead (33-77x smaller)."""
        assert mode in ("st", "sched", "greedy", "gumbel", "teacher")
        token_embedding = nn.Embed(self.n_vocab, D_EMBED,
                                   embedding_init=embedding_init,
                                   dtype=self.dtype, name="token_embedding")
        start_embedding = nn.Embed(1, D_EMBED, embedding_init=embedding_init,
                                   dtype=self.dtype, name="start_embedding")
        enc_style_embedding = nn.Embed(self.n_class, 2 * D_ENC,
                                       embedding_init=embedding_init,
                                       dtype=self.dtype,
                                       name="enc_style_embedding")
        style_embedding = nn.Embed(self.n_class, D_DEC,
                                   embedding_init=embedding_init,
                                   dtype=self.dtype, name="style_embedding")
        transfer = nn.Dense(D_DEC, use_bias=False,
                            kernel_init=linear_kernel_init, dtype=self.dtype,
                            name="transfer")
        emb_table = token_embedding.embedding.astype(self.dtype)

        # ----- encode (BiLSTM, style-initialized hidden state, rnn.py:57-62)
        if jnp.issubdtype(inp.dtype, jnp.integer):
            e = nn.Dropout(self.p_drop)(token_embedding(inp),
                                        deterministic=deterministic)
        else:
            e = hard_sample_st(inp.astype(self.dtype)) @ emb_table
        h0_enc = enc_style_embedding(label_i)      # (B, 2*D_ENC)
        h0_f, h0_b = jnp.split(h0_enc, 2, axis=-1)  # direction 0 / 1
        mem_f, (_, c_f) = _EncoderScan(D_ENC, self.dtype, name="encoder_fwd")(h0_f, e)
        mem_b, (_, c_b) = _EncoderScan(D_ENC, self.dtype, name="encoder_bwd")(
            h0_b, jnp.flip(e, axis=1))
        memory = jnp.concatenate([mem_f, jnp.flip(mem_b, axis=1)], axis=-1)
        c_end = jnp.concatenate([c_f, c_b], axis=-1)

        B = memory.shape[0]
        L_out = self.max_len if x is None else x.shape[1]

        h0 = style_embedding(label)                            # (B, D_DEC)
        c0 = nn.leaky_relu(transfer(c_end), 0.1)               # (B, D_DEC)
        x0 = start_embedding(jnp.zeros((B,), jnp.int32))       # (B, D_EMBED)
        if x is not None:
            teacher = jnp.take(emb_table, x, axis=0)           # (B, L, E)
            teacher = jnp.swapaxes(teacher, 0, 1)              # (L, B, E)
            if mode == "sched" and not self.is_initializing():
                coin_key = self.make_rng("coin")
                coins = jax.random.bernoulli(coin_key, 0.5, (L_out,))
            else:
                coins = jnp.zeros((L_out,), bool)
        else:
            teacher = jnp.zeros((L_out, B, D_EMBED), self.dtype)
            coins = jnp.zeros((L_out,), bool)
        coins = coins[:, None, None]  # broadcast against (B, E)

        step_cls = _DecoderStep
        if self.remat:
            step_cls = nn.remat(
                _DecoderStep,
                static_argnums=(),
                prevent_cse=False,
            )
        scan = nn.scan(
            step_cls,
            variable_broadcast="params",
            split_rngs={"dropout": True, "gumbel": True, "params": False},
            # xs scans over time; memory / emb_table are loop invariants
            in_axes=(0, nn.broadcast, nn.broadcast),
            out_axes=0,
        )
        rep = self.rep_penalty if mode == "greedy" else 0.0
        step = scan(
            n_vocab=self.n_vocab,
            mode=mode,
            tau=tau,
            p_drop=self.p_drop,
            deterministic=deterministic,
            dtype=self.dtype,
            # the fused Pallas head argmaxes inside the kernel, before the
            # penalty could apply — fall back to the XLA head when active
            use_pallas=self.use_pallas and rep <= 0,
            pallas_interpret=self.pallas_interpret,
            rep_penalty=rep,
            name="decoder",
        )
        if rep > 0:
            counts0 = jnp.zeros((B, self.n_vocab), self.dtype)
            carry0 = (h0, c0, x0, counts0)
        else:
            carry0 = (h0, c0, x0)
        _, outs = step(carry0, (teacher, coins), memory, emb_table)
        # time_major_out applies to SOFT (L, B, V) stacks only — that's where
        # skipping the relayout saves 92 MB of copies. Integer id outputs are
        # always batch-major (the transpose is tiny), so both backbones expose
        # one contract (see train.common.generator_call).
        if time_major_out and outs.ndim == 3:
            return outs  # (L_out, B, V) — scan-native soft stack
        return jnp.swapaxes(outs, 0, 1)  # (B, L_out, V) or (B, L_out) ids


class BeamDenoiseSeq2Seq(DenoiseSeq2Seq):
    """Stateful beam decode sharing the trained ``DenoiseSeq2Seq`` params.

    Flax param trees are name-based, so instantiating the same-named
    submodules (token_embedding, encoder_fwd/bwd, style/enc_style embeddings,
    transfer, decoder) lets ``BeamDenoiseSeq2Seq(...).apply(params, ...)``
    run directly on a checkpoint of the base model. Unlike prefix-rescoring
    beam search (models/beam.py::beam_search — O(L) FULL teacher-forced
    passes, encoder recomputed each step), this carries the decoder (h, c)
    per beam across steps: ONE encoder pass and L single-token decoder steps
    total, with beam bookkeeping as top_k + gathers (VERDICT r2 weak-4).
    """

    beam_size: int = 4
    length_penalty: float = 0.6

    @nn.compact
    def __call__(self, x, label_i, label):  # noqa: D401 - beam entry
        """Returns (ids (B, L), normalized scores (B,)) for the best beam."""
        K = self.beam_size
        token_embedding = nn.Embed(self.n_vocab, D_EMBED,
                                   embedding_init=embedding_init,
                                   dtype=self.dtype, name="token_embedding")
        start_embedding = nn.Embed(1, D_EMBED, embedding_init=embedding_init,
                                   dtype=self.dtype, name="start_embedding")
        enc_style_embedding = nn.Embed(self.n_class, 2 * D_ENC,
                                       embedding_init=embedding_init,
                                       dtype=self.dtype,
                                       name="enc_style_embedding")
        style_embedding = nn.Embed(self.n_class, D_DEC,
                                   embedding_init=embedding_init,
                                   dtype=self.dtype, name="style_embedding")
        transfer = nn.Dense(D_DEC, use_bias=False,
                            kernel_init=linear_kernel_init, dtype=self.dtype,
                            name="transfer")
        emb_table = token_embedding.embedding.astype(self.dtype)

        # ----- encode ONCE on the un-tiled batch (B)
        e = token_embedding(x)
        h0_enc = enc_style_embedding(label_i)
        h0_f, h0_b = jnp.split(h0_enc, 2, axis=-1)
        mem_f, (_, c_f) = _EncoderScan(D_ENC, self.dtype, name="encoder_fwd")(h0_f, e)
        mem_b, (_, c_b) = _EncoderScan(D_ENC, self.dtype, name="encoder_bwd")(
            h0_b, jnp.flip(e, axis=1))
        memory = jnp.concatenate([mem_f, jnp.flip(mem_b, axis=1)], axis=-1)
        c_end = jnp.concatenate([c_f, c_b], axis=-1)

        B = memory.shape[0]
        L = self.max_len
        N = B * K

        def tile(a):
            return jnp.repeat(a, K, axis=0)

        h = tile(style_embedding(label))
        c = tile(nn.leaky_relu(transfer(c_end), 0.1))
        x_t = tile(start_embedding(jnp.zeros((B,), jnp.int32)))
        mem_rep = tile(memory)

        step = _DecoderStep(n_vocab=self.n_vocab, mode="teacher", tau=1.0,
                            p_drop=self.p_drop, deterministic=True,
                            dtype=self.dtype, name="decoder")
        dummy_teacher = jnp.zeros((N, D_EMBED), self.dtype)
        dummy_coin = jnp.zeros((N, 1), bool)

        # beams 1..K-1 start masked so the K identical start states don't
        # produce K copies of the greedy path
        scores = jnp.tile(
            jnp.concatenate([jnp.zeros((1,)), jnp.full((K - 1,), -1e9)]), (B,))
        seqs = jnp.zeros((N, L), jnp.int32)
        group = jnp.arange(B)[:, None] * K  # (B, 1) row offsets

        for t in range(L):
            (h, c, _), logits_t = step(
                (h, c, x_t), (dummy_teacher, dummy_coin), mem_rep, emb_table)
            logp = jax.nn.log_softmax(logits_t.astype(jnp.float32), axis=-1)
            total = (scores[:, None] + logp).reshape(B, K * self.n_vocab)
            scores, flat = jax.lax.top_k(total, K)            # (B, K)
            beam_idx = flat // self.n_vocab
            tok = (flat % self.n_vocab).astype(jnp.int32)
            src_rows = (group + beam_idx).reshape(-1)          # (N,)
            h = h[src_rows]
            c = c[src_rows]
            seqs = seqs[src_rows].at[:, t].set(tok.reshape(-1))
            scores = scores.reshape(-1)
            x_t = jnp.take(emb_table, tok.reshape(-1), axis=0)

        norm = (scores / (L ** self.length_penalty)).reshape(B, K)
        best = jnp.argmax(norm, axis=1)
        out = seqs.reshape(B, K, L)
        return (
            jnp.take_along_axis(out, best[:, None, None], 1)[:, 0],
            jnp.take_along_axis(norm, best[:, None], 1)[:, 0],
        )


def greedy_transfer(model: DenoiseSeq2Seq, params, x, labels, rngs=None):
    """Inference helper: transfer x to the opposite style with greedy decode
    (reference test path, ``src/main_optimize.py:157-164``)."""
    return model.apply(
        params, x, labels, None, 1 - labels, mode="greedy", deterministic=True,
        rngs=rngs,
    )
