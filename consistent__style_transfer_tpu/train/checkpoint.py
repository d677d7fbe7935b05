"""Full-train-state checkpointing (Orbax) — resume capability the reference
lacks entirely (it persists best weights only, never optimizer state or step;
SURVEY.md §5). Retention matches the reference's best-only discipline:
``max_to_keep=1``.

Used by the optimize stage when ``Config.resume`` is set: the newest full
state (G params, D params, both Adam states, step counter, best-val) restores
exactly; weight-only ``.msgpack``/``.pth`` artifacts remain the cross-stage
contract.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np


def _to_pure(tree):
    return jax.tree.map(lambda x: np.asarray(jax.device_get(x)), tree)


class StateCheckpointer:
    def __init__(self, directory: str, max_to_keep: int = 1):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
        )

    def save(self, step: int, payload: dict[str, Any]) -> None:
        self.manager.save(
            step, args=self._ocp.args.StandardSave(_to_pure(payload))
        )
        self.manager.wait_until_finished()

    def latest_step(self) -> int | None:
        return self.manager.latest_step()

    def restore(self, template: dict[str, Any], step: int | None = None):
        step = self.latest_step() if step is None else step
        if step is None:
            return None
        return self.manager.restore(
            step, args=self._ocp.args.StandardRestore(_to_pure(template))
        )

    def close(self) -> None:
        self.manager.close()
