"""Pallas kernels vs their jnp references (interpret mode on the CPU mesh;
the same code compiles with Mosaic on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from consistent__style_transfer_tpu.kernels.decode_step import (
    decode_head_reference,
    fused_decode_logits,
)
from consistent__style_transfer_tpu.kernels.sinkhorn import (
    sinkhorn_pallas,
    sinkhorn_pallas_cr,
)
from consistent__style_transfer_tpu.ops.emd import sinkhorn_ot_cost


def test_sinkhorn_pallas_matches_jnp():
    rng = np.random.default_rng(0)
    B, N, M = 4, 8, 8
    p = rng.random((B, N)).astype(np.float32)
    q = rng.random((B, M)).astype(np.float32)
    p[:, 6:] = 0  # padded atoms
    q[:, 5:] = 0
    p /= p.sum(-1, keepdims=True)
    q /= q.sum(-1, keepdims=True)
    x = rng.normal(size=(B, N, 3))
    y = rng.normal(size=(B, M, 3))
    D = np.linalg.norm(x[:, :, None] - y[:, None, :], axis=-1).astype(np.float32)
    ref = np.asarray(sinkhorn_ot_cost(p, q, D, epsilon=0.05, n_iters=50))
    got = np.asarray(sinkhorn_pallas(p, q, D, epsilon=0.05, n_iters=50,
                                     interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_sinkhorn_pallas_cr_matches_jnp():
    """Transpose-free column/row-layout variant — same semantics, blocks
    shaped for Mosaic tile legality (kernels/sinkhorn.py::_kernel_cr)."""
    rng = np.random.default_rng(2)
    B, N, M = 5, 9, 7  # deliberately non-tile shapes -> exercises padding
    p = rng.random((B, N)).astype(np.float32)
    q = rng.random((B, M)).astype(np.float32)
    p[:, 7:] = 0
    q[:, 5:] = 0
    p /= p.sum(-1, keepdims=True)
    q /= q.sum(-1, keepdims=True)
    x = rng.normal(size=(B, N, 3))
    y = rng.normal(size=(B, M, 3))
    D = np.linalg.norm(x[:, :, None] - y[:, None, :], axis=-1).astype(np.float32)
    ref = np.asarray(sinkhorn_ot_cost(p, q, D, epsilon=0.05, n_iters=50))
    got = np.asarray(sinkhorn_pallas_cr(p, q, D, epsilon=0.05, n_iters=50,
                                        interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_fused_decode_head_matches_reference():
    rng = np.random.default_rng(1)
    B, Din, H, V = 8, 64, 32, 300  # V not a tile multiple -> exercises masking
    x = rng.normal(size=(B, Din)).astype(np.float32)
    w1 = rng.normal(size=(Din, H)).astype(np.float32) * 0.1
    b1 = rng.normal(size=(H,)).astype(np.float32) * 0.1
    w2 = rng.normal(size=(H, V)).astype(np.float32) * 0.1
    ref_ids, ref_h = decode_head_reference(x, w1, b1, w2)
    ids, h = fused_decode_logits(x, w1, b1, w2, tile_v=128, interpret=True)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ref_ids))
    np.testing.assert_allclose(np.asarray(h), np.asarray(ref_h), rtol=1e-5, atol=1e-5)


def test_fused_decode_head_single_tile():
    rng = np.random.default_rng(2)
    B, Din, H, V = 4, 16, 8, 64
    x = rng.normal(size=(B, Din)).astype(np.float32)
    w1 = rng.normal(size=(Din, H)).astype(np.float32)
    b1 = np.zeros(H, np.float32)
    w2 = rng.normal(size=(H, V)).astype(np.float32)
    ref_ids, _ = decode_head_reference(x, w1, b1, w2)
    ids, _ = fused_decode_logits(x, w1, b1, w2, tile_v=64, interpret=True)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ref_ids))
