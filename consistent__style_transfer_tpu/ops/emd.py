"""Earth-Mover's-Distance / optimal-transport primitives.

Three tiers, replacing two native C++ deps of the reference:

- :func:`pyemd_ones_emd` — closed form for the all-ones distance matrix used
  by the STI metric (reference ``evaluate/auto/transfer_intensity.py:8-11``
  calls pyemd with ``np.ones((N, N))`` — ones on the *diagonal too*, so every
  feasible transport plan costs exactly the shipped mass and the EMD is
  ``min(sum p, sum q)``, ~1.0 for probability vectors; the reference's STI is
  therefore ±1 per pair, i.e. 2·direction-accuracy − 1). We reproduce that
  semantic exactly; :func:`ones_metric_emd` is the zero-diagonal variant
  (0.5·L1) kept for the sensible-metric option. Both jittable and batched.
- :func:`exact_ot_cost` — exact transport LP (scipy HiGHS) for general ground
  metrics; the eval-parity path for WMD (gensim/pyemd semantics).
- :func:`sinkhorn_ot_cost` — entropy-regularized batched Sinkhorn in pure
  ``jnp`` for the on-device WMD training-label path (the reference computed
  per-pair exact WMD on CPU inside the collate, ``src/loader.py:60`` — its
  data-path bottleneck). A Pallas-fused variant lives in
  :mod:`consistent__style_transfer_tpu.kernels.sinkhorn`.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax

_NEG = -1e30


def pyemd_ones_emd(p, q):
    """Exact value of ``pyemd.emd(p, q, np.ones((N, N)))``: with unit cost
    everywhere (diagonal included) every feasible plan ships min(Σp, Σq) mass
    at cost 1/unit. Batched over leading dims."""
    p = jnp.asarray(p)
    q = jnp.asarray(q)
    return jnp.minimum(jnp.sum(p, axis=-1), jnp.sum(q, axis=-1))


def ones_metric_emd(p, q):
    """EMD with a zero-diagonal all-ones distance matrix = 0.5 * ||p - q||_1
    for equal-mass inputs. Accepts batched inputs (..., N)."""
    p = jnp.asarray(p)
    q = jnp.asarray(q)
    return 0.5 * jnp.sum(jnp.abs(p - q), axis=-1)


def exact_ot_cost(p: np.ndarray, q: np.ndarray, D: np.ndarray) -> float:
    """Exact optimal-transport cost ``min_T <T, D>`` s.t. ``T1=p, T'1=q, T>=0``.

    Small-problem LP (WMD pairs have <= a few dozen atoms); HiGHS is exact to
    solver tolerance, matching pyemd on equal-mass inputs.
    """
    from scipy.optimize import linprog
    from scipy import sparse

    p = np.asarray(p, dtype=np.float64)
    q = np.asarray(q, dtype=np.float64)
    n, m = len(p), len(q)
    if n == 0 or m == 0:
        return float("inf")
    c = np.asarray(D, dtype=np.float64).reshape(-1)
    rows: list[int] = []
    cols: list[int] = []
    for i in range(n):  # row-sum constraints
        rows.extend([i] * m)
        cols.extend(range(i * m, (i + 1) * m))
    for j in range(m):  # col-sum constraints
        rows.extend([n + j] * n)
        cols.extend(range(j, n * m, m))
    A = sparse.csr_matrix((np.ones(2 * n * m), (rows, cols)), shape=(n + m, n * m))
    b = np.concatenate([p / p.sum(), q / q.sum()])
    res = linprog(c, A_eq=A, b_eq=b, bounds=(0, None), method="highs")
    if not res.success:
        return float("inf")
    return float(res.fun)


def _masked_lse(x, mask, axis):
    """logsumexp over entries where mask is True; -inf-free for empty rows."""
    x = jnp.where(mask, x, _NEG)
    m = jnp.max(x, axis=axis, keepdims=True)
    safe_m = jnp.maximum(m, _NEG / 2)
    out = jnp.squeeze(safe_m, axis) + jnp.log(
        jnp.sum(jnp.exp(x - safe_m), axis=axis)
    )
    return out


def sinkhorn_ot_cost(p, q, D, epsilon: float = 0.05, n_iters: int = 100):
    """Batched entropy-regularized OT cost (log-domain Sinkhorn).

    Args:
      p: (..., N) source histograms; zero entries = padded/absent atoms.
      q: (..., M) target histograms.
      D: (..., N, M) ground-metric cost matrices.
      epsilon: entropic regularization strength.
      n_iters: fixed iteration count (static for XLA).

    Returns ``<T*, D>`` — the unregularized transport cost at the Sinkhorn
    plan — with shape (...,). Fully jittable and batchable; this is the
    TPU-native replacement for per-pair CPU WMD calls.
    """
    p = jnp.asarray(p, jnp.float32)
    q = jnp.asarray(q, jnp.float32)
    D = jnp.asarray(D, jnp.float32)
    pm = p > 0
    qm = q > 0
    pair_mask = pm[..., :, None] & qm[..., None, :]
    logp = jnp.where(pm, jnp.log(jnp.where(pm, p, 1.0)), _NEG)
    logq = jnp.where(qm, jnp.log(jnp.where(qm, q, 1.0)), _NEG)
    logK = jnp.where(pair_mask, -D / epsilon, _NEG)

    def body(carry, _):
        logu, logv = carry
        logu = logp - _masked_lse(logK + logv[..., None, :], pair_mask, axis=-1)
        logu = jnp.where(pm, logu, _NEG)
        logv = logq - _masked_lse(logK + logu[..., :, None], pair_mask, axis=-2)
        logv = jnp.where(qm, logv, _NEG)
        return (logu, logv), None

    logu = jnp.where(pm, jnp.zeros_like(p), _NEG)
    logv = jnp.where(qm, jnp.zeros_like(q), _NEG)
    (logu, logv), _ = lax.scan(body, (logu, logv), None, length=n_iters)

    logT = logu[..., :, None] + logK + logv[..., None, :]
    T = jnp.where(pair_mask, jnp.exp(logT), 0.0)
    return jnp.sum(T * D, axis=(-2, -1))
