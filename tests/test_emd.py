import numpy as np
import pytest

from consistent__style_transfer_tpu.ops.emd import (
    exact_ot_cost,
    ones_metric_emd,
    pyemd_ones_emd,
    sinkhorn_ot_cost,
)


def test_pyemd_ones_semantics():
    """pyemd with np.ones((N,N)) (diagonal included) = min(sum p, sum q):
    verified against the exact LP."""
    rng = np.random.default_rng(0)
    for _ in range(5):
        p = rng.random(4)
        p /= p.sum()
        q = rng.random(4)
        q /= q.sum()
        D = np.ones((4, 4))
        assert exact_ot_cost(p, q, D) == pytest.approx(1.0, abs=1e-9)
        assert float(pyemd_ones_emd(p, q)) == pytest.approx(1.0, abs=1e-6)


def test_ones_metric_emd_zero_diag():
    rng = np.random.default_rng(0)
    for _ in range(5):
        p = rng.random(4)
        p /= p.sum()
        q = rng.random(4)
        q /= q.sum()
        D0 = np.ones((4, 4)) - np.eye(4)
        assert exact_ot_cost(p, q, D0) == pytest.approx(
            float(ones_metric_emd(p, q)), abs=1e-6
        )


def test_exact_ot_simple():
    p = np.array([1.0, 0.0])
    q = np.array([0.0, 1.0])
    D = np.array([[0.0, 2.5], [2.5, 0.0]])
    assert exact_ot_cost(p, q, D) == pytest.approx(2.5)
    assert exact_ot_cost(p, p, D) == pytest.approx(0.0)


def test_sinkhorn_close_to_exact():
    rng = np.random.default_rng(1)
    n, m = 6, 5
    p = rng.random(n)
    p /= p.sum()
    q = rng.random(m)
    q /= q.sum()
    x = rng.normal(size=(n, 3))
    y = rng.normal(size=(m, 3))
    D = np.linalg.norm(x[:, None] - y[None, :], axis=-1)
    exact = exact_ot_cost(p, q, D)
    approx = float(sinkhorn_ot_cost(p, q, D, epsilon=0.01, n_iters=500))
    assert approx == pytest.approx(exact, rel=0.05)


def test_sinkhorn_batched_and_masked():
    rng = np.random.default_rng(2)
    B, n = 4, 8
    p = rng.random((B, n))
    q = rng.random((B, n))
    p[:, 5:] = 0  # padding atoms
    q[:, 6:] = 0
    p /= p.sum(-1, keepdims=True)
    q /= q.sum(-1, keepdims=True)
    x = rng.normal(size=(B, n, 4))
    y = rng.normal(size=(B, n, 4))
    D = np.linalg.norm(x[:, :, None] - y[:, None, :], axis=-1)
    out = np.asarray(sinkhorn_ot_cost(p, q, D, epsilon=0.02, n_iters=300))
    assert out.shape == (B,)
    for b in range(B):
        exact = exact_ot_cost(p[b][:5], q[b][:6], D[b][:5, :6])
        assert out[b] == pytest.approx(exact, rel=0.08, abs=0.02)
