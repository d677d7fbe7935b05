"""Train-state + checkpoint runtime.

Checkpoint semantics match the reference exactly at the file level: each
stage hand-saves best weights only (PL checkpointing was disabled everywhere,
``src/main_optimize.py:212``) — per-task ``{cls,mat,dn}`` for pretrain
(``src/main_pretrain.py:105``), ``G`` for warmup (``src/main_warmup.py:77``),
``G_epoch_<n>`` with previous-best deletion for optimize
(``src/main_optimize.py:148-151``). Our native format is flax msgpack
(``.msgpack``); ``utils/torch_interop.py`` exports/imports the reference's
``.pth`` state_dicts for drop-in checkpoint parity.
"""

from __future__ import annotations

import glob
import os
from typing import Any

import jax
import optax
from flax import serialization, struct
from flax.core import FrozenDict


class TrainState(struct.PyTreeNode):
    step: int
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            opt_state=new_opt,
        )

    @classmethod
    def create(cls, params, tx):
        return cls(step=0, params=params, opt_state=tx.init(params), tx=tx)


def adam_with_clip(lr: float, clip: float) -> optax.GradientTransformation:
    """Adam with torch-default betas/eps behind a global-norm clip — the
    optimizer every reference stage uses (with PL ``gradient_clip_val``)."""
    return optax.chain(
        optax.clip_by_global_norm(clip),
        optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8),
    )


def save_params(params, path: str) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(params))


def load_params(path: str, template):
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


def params_exist(path: str) -> bool:
    return os.path.exists(path)


class BestKeeper:
    """Save-on-improvement with optional previous-best deletion (the optimize
    stage's ``G_epoch_<n>`` retention, ``src/main_optimize.py:144-151``)."""

    def __init__(self, mode: str = "min"):
        assert mode in ("min", "max")
        self.mode = mode
        self.best = float("inf") if mode == "min" else float("-inf")
        self.last_path: str | None = None

    def improved(self, value: float) -> bool:
        return value < self.best if self.mode == "min" else value > self.best

    def update(self, value: float, params, path: str, delete_previous: bool = False) -> bool:
        if not self.improved(value):
            return False
        self.best = value
        save_params(params, path)
        if delete_previous and self.last_path and self.last_path != path \
                and os.path.exists(self.last_path):
            os.remove(self.last_path)
        self.last_path = path
        return True


def newest_checkpoint(dump_dir: str, pattern: str = "G_epoch_*.msgpack") -> str | None:
    """Reference test-mode resolution: lexicographically newest file in the
    task dump dir (``src/main_optimize.py:47-54``)."""
    files = sorted(glob.glob(os.path.join(dump_dir, pattern)))
    return files[-1] if files else None


def unreplicate(tree):
    return jax.tree.map(lambda x: jax.device_get(x), tree)
