"""Loss primitives matching torch semantics used by the reference drivers.

Notably the reference's token-level cross entropy does NOT mask padding
(``nn.CrossEntropyLoss`` over flattened (B*L, V), e.g.
``src/main_warmup.py:57``, ``src/main_optimize.py:109``) — PAD positions are
real targets. We preserve that behavior for parity; a ``mask`` argument is
available when callers want the masked variant.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray, mask=None) -> jnp.ndarray:
    """Mean CE over all elements. logits (..., C), integer labels (...)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    if mask is None:
        return jnp.mean(nll)
    mask = mask.astype(nll.dtype)
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def softmax_cross_entropy_tokens(logits: jnp.ndarray, targets: jnp.ndarray,
                                 row_mask=None) -> jnp.ndarray:
    """CE over token grids: logits (B, L, V), targets (B, L); mean over B*L —
    torch ``CrossEntropyLoss`` on reshaped inputs. ``row_mask`` (B,) restricts
    the mean to valid rows (the pipeline pads partial eval batches by
    repeating sample 0; masked means keep the val signal unpolluted)."""
    if row_mask is None:
        return cross_entropy(logits.reshape(-1, logits.shape[-1]), targets.reshape(-1))
    mask = jnp.broadcast_to(row_mask[:, None], targets.shape)
    return cross_entropy(logits.reshape(-1, logits.shape[-1]), targets.reshape(-1),
                         mask=mask.reshape(-1))


def mse(pred: jnp.ndarray, target: jnp.ndarray, mask=None) -> jnp.ndarray:
    if mask is None:
        return jnp.mean((pred - target) ** 2)
    mask = jnp.broadcast_to(mask, pred.shape).astype(pred.dtype)
    return jnp.sum(mask * (pred - target) ** 2) / jnp.maximum(jnp.sum(mask), 1.0)


def masked_row_mean(values: jnp.ndarray, row_mask: jnp.ndarray) -> jnp.ndarray:
    """Mean of per-row values (B,) over rows where ``row_mask`` is nonzero."""
    row_mask = row_mask.astype(values.dtype)
    return jnp.sum(values * row_mask) / jnp.maximum(jnp.sum(row_mask), 1.0)


def bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Numerically stable binary cross entropy with logits (torch
    ``BCEWithLogitsLoss``), mean-reduced."""
    zeros = jnp.zeros_like(logits)
    loss = jnp.maximum(logits, zeros) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    return jnp.mean(loss)
