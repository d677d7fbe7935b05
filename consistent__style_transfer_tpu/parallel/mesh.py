"""Device-mesh construction.

The reference has no distributed code at all (single GPU, ``job.yaml:30``);
here scaling is a first-class seam: a 2-D ``Mesh(('data', 'model'))`` over
whatever devices exist. All communication is implicit — pjit/XLA insert the
psum/all-gather collectives over ICI from the shardings in
:mod:`consistent__style_transfer_tpu.parallel.sharding`.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(n_data: int | None = None, n_model: int = 1, devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n_data is None:
        n_data = max(1, n // n_model)
    use = n_data * n_model
    assert use <= n, f"mesh {n_data}x{n_model} needs {use} devices, have {n}"
    arr = np.array(devices[:use]).reshape(n_data, n_model)
    return Mesh(arr, ("data", "model"))
