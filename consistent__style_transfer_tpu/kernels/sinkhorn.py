"""Batched Sinkhorn optimal-transport Pallas kernel.

The WMD training-label path solves one small OT problem per sentence pair
(atoms <= ~48). The pure-jnp implementation (ops/emd.py) re-materializes the
(B, N, M) kernel matrix in HBM on every Sinkhorn iteration; this kernel keeps
one pair's cost matrix and both potentials resident in VMEM for all
iterations — a single HBM read of the inputs and a single write of the cost,
with the iteration loop running entirely on the VPU.

Grid: one program per batch element (pairs are independent). Shapes are
padded to the VPU lane layout (N, M multiples of 8/128 recommended but not
required — Mosaic pads internally for these small blocks).

Usage: ``sinkhorn_pallas(p, q, D)`` with p (B, N), q (B, M), D (B, N, M);
returns (B,) transport costs. Semantics identical to
``ops.emd.sinkhorn_ot_cost`` (log-domain, zero-mass masking); verified
against it in tests/test_kernels.py (interpret mode on CPU, compiled on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pallas TPU backend is absent on some CPU-only installs
    from jax.experimental.pallas import tpu as pltpu

    _HAVE_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAVE_PLTPU = False

_NEG = -1e30


def _kernel(p_ref, q_ref, d_ref, out_ref, *, epsilon: float, n_iters: int):
    p = p_ref[0, :]          # (N,)
    q = q_ref[0, :]          # (M,)
    D = d_ref[0, :, :]       # (N, M)
    pm = p > 0
    qm = q > 0
    pair = pm[:, None] & qm[None, :]
    logp = jnp.where(pm, jnp.log(jnp.where(pm, p, 1.0)), _NEG)
    logq = jnp.where(qm, jnp.log(jnp.where(qm, q, 1.0)), _NEG)
    logK = jnp.where(pair, -D / epsilon, _NEG)

    def lse(x, mask, axis):
        x = jnp.where(mask, x, _NEG)
        m = jnp.maximum(jnp.max(x, axis=axis, keepdims=True), _NEG / 2)
        return jnp.squeeze(m, axis) + jnp.log(jnp.sum(jnp.exp(x - m), axis=axis))

    def body(_, carry):
        logu, logv = carry
        logu = jnp.where(pm, logp - lse(logK + logv[None, :], pair, 1), _NEG)
        logv = jnp.where(qm, logq - lse(logK + logu[:, None], pair, 0), _NEG)
        return logu, logv

    logu0 = jnp.where(pm, jnp.zeros_like(p), _NEG)
    logv0 = jnp.where(qm, jnp.zeros_like(q), _NEG)
    logu, logv = jax.lax.fori_loop(0, n_iters, body, (logu0, logv0))

    logT = logu[:, None] + logK + logv[None, :]
    T = jnp.where(pair, jnp.exp(logT), 0.0)
    out_ref[0, 0] = jnp.sum(T * D)


@functools.partial(jax.jit, static_argnames=("epsilon", "n_iters", "interpret"))
def sinkhorn_pallas(p, q, D, epsilon: float = 0.05, n_iters: int = 100,
                    interpret: bool = False):
    p = jnp.asarray(p, jnp.float32)
    q = jnp.asarray(q, jnp.float32)
    D = jnp.asarray(D, jnp.float32)
    B, N = p.shape
    M = q.shape[1]
    kwargs = {}
    if _HAVE_PLTPU and not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=max(4 * N * M * 4, 1 << 20),
        )
    mem = pltpu.VMEM if (_HAVE_PLTPU and not interpret) else None

    def spec(block, index_map):
        if mem is None:
            return pl.BlockSpec(block, index_map)
        return pl.BlockSpec(block, index_map, memory_space=mem)

    out = pl.pallas_call(
        functools.partial(_kernel, epsilon=epsilon, n_iters=n_iters),
        grid=(B,),
        in_specs=[
            spec((1, N), lambda b: (b, 0)),
            spec((1, M), lambda b: (b, 0)),
            spec((1, N, M), lambda b: (b, 0, 0)),
        ],
        out_specs=spec((1, 1), lambda b: (b, 0)),
        out_shape=jax.ShapeDtypeStruct((B, 1), jnp.float32),
        interpret=interpret,
        **kwargs,
    )(p, q, D)
    return out[:, 0]
