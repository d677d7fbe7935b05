"""Fused decode-step head kernel: FFN -> vocab projection -> argmax.

In greedy decode the per-step head computes
``argmax_v( LeakyReLU(x @ W1 + b1) @ W2 )`` where x = concat[o_t, a_t]
(B, 1024) and W2 is (512, V). Materializing the (B, V) logits in HBM costs
~10 MB per step at yelp shapes (256 x 10000 f32) x max_len steps x both
rollouts — pure bandwidth waste when only the argmax survives. This kernel
tiles W2 over the vocab, keeps the FFN hidden state h (B, 512) and the
running (max, argmax) in VMEM scratch across grid steps, and writes only the
(B,) winner ids.

Grid: (cdiv(V, TILE_V),) — sequential on TPU, so scratch accumulates across
tiles. The MXU sees (B,512) x (512,TILE_V) matmuls; the reduction rides the
VPU. Verified against the jnp reference in tests/test_kernels.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu

    _HAVE_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAVE_PLTPU = False

NEG = -1e30


def decode_head_reference(x, w1, b1, w2):
    """jnp reference / fallback: returns (argmax ids (B,), hidden h (B, H))."""
    h = jax.nn.leaky_relu(x @ w1 + b1, 0.1)
    logits = h @ w2
    return jnp.argmax(logits, axis=-1).astype(jnp.int32), h


def _kernel(x_ref, w1_ref, b1_ref, w2_ref, ids_ref, h_out_ref,
            h_ref, best_ref, arg_ref, *, v_total: int, tile_v: int):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h = jnp.dot(x_ref[:, :], w1_ref[:, :], preferred_element_type=jnp.float32)
        h = h + b1_ref[0, :][None, :]
        h_ref[:, :] = jnp.where(h >= 0, h, 0.1 * h)  # LeakyReLU(0.1)
        best_ref[:, :] = jnp.full_like(best_ref, NEG)
        arg_ref[:, :] = jnp.zeros_like(arg_ref)

    logits = jnp.dot(h_ref[:, :].astype(w2_ref.dtype), w2_ref[:, :],
                     preferred_element_type=jnp.float32)
    # mask padded vocab columns in the final tile
    col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1) + t * tile_v
    logits = jnp.where(col < v_total, logits, NEG)
    tile_max = jnp.max(logits, axis=1, keepdims=True)
    tile_arg = jnp.argmax(logits, axis=1).astype(jnp.int32)[:, None] + t * tile_v
    better = tile_max > best_ref[:, :]
    best_ref[:, :] = jnp.where(better, tile_max, best_ref[:, :])
    arg_ref[:, :] = jnp.where(better, tile_arg, arg_ref[:, :])

    @pl.when(t == pl.num_programs(0) - 1)
    def _():
        ids_ref[:, :] = arg_ref[:, :]
        h_out_ref[:, :] = h_ref[:, :]


@functools.partial(jax.jit, static_argnames=("tile_v", "interpret"))
def fused_decode_logits(x, w1, b1, w2, tile_v: int = 2048, interpret: bool = False):
    """Returns (argmax ids (B,), hidden h (B, H)) for the decode head.

    x: (B, Din); w1: (Din, H); b1: (H,); w2: (H, V).
    """
    # bf16 inputs stay bf16 (MXU-native; dots accumulate in f32 via
    # preferred_element_type); everything else is upcast to f32.
    comp = jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32
    x = jnp.asarray(x, comp)
    w1 = jnp.asarray(w1, comp)
    b1 = jnp.asarray(b1, jnp.float32).reshape(1, -1)
    w2 = jnp.asarray(w2, comp)
    B, Din = x.shape
    H = w1.shape[1]
    V = w2.shape[1]
    tile_v = min(tile_v, V)
    n_tiles = pl.cdiv(V, tile_v)
    pad_v = n_tiles * tile_v - V
    if pad_v:
        w2 = jnp.pad(w2, ((0, 0), (0, pad_v)))

    mem = pltpu.VMEM if (_HAVE_PLTPU and not interpret) else None

    def spec(block, index_map):
        if mem is None:
            return pl.BlockSpec(block, index_map)
        return pl.BlockSpec(block, index_map, memory_space=mem)

    assert _HAVE_PLTPU, "pallas TPU module required (present in this jax build)"
    scratch = [
        pltpu.VMEM((B, H), jnp.float32),
        pltpu.VMEM((B, 1), jnp.float32),
        pltpu.VMEM((B, 1), jnp.int32),
    ]

    ids, h = pl.pallas_call(
        functools.partial(_kernel, v_total=V, tile_v=tile_v),
        grid=(n_tiles,),
        in_specs=[
            spec((B, Din), lambda t: (0, 0)),
            spec((Din, H), lambda t: (0, 0)),
            spec((1, H), lambda t: (0, 0)),
            spec((H, tile_v), lambda t: (0, t)),
        ],
        out_specs=(
            spec((B, 1), lambda t: (0, 0)),
            spec((B, H), lambda t: (0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
        ),
        scratch_shapes=scratch,
        interpret=interpret,
    )(x, w1, b1, w2)
    return ids[:, 0], h
