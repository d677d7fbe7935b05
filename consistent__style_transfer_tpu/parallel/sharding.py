"""Sharding rules: params and batches -> NamedShardings over the mesh.

Data parallelism shards the batch axis over ``data``; tensor parallelism
shards the transformer attention/MLP and vocab-projection parameters over
``model`` (Megatron-style column/row split pairs, so each layer needs exactly
one psum, inserted automatically by XLA). Everything else is replicated.

The reference's workload is tiny (<=6-layer d=512 models, <=30-token
sentences), so DP is the strategy that matters; the TP rules exist as the
scaling seam for the stretch T5-small backbone (BASELINE.json configs[4]) and
are exercised in tests/test_parallel.py on a CPU mesh.
"""

from __future__ import annotations

import re

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (path regex, PartitionSpec) — first match wins; paths look like
# "params/lm/layer_0/self_attn/in_proj/kernel".
TP_RULES: list[tuple[str, P]] = [
    (r"self_attn/in_proj/kernel$", P(None, "model")),
    (r"self_attn/in_proj/bias$", P("model")),
    (r"self_attn/out_proj/kernel$", P("model", None)),
    (r"linear1/kernel$", P(None, "model")),
    (r"linear1/bias$", P("model")),
    (r"linear2/kernel$", P("model", None)),
    (r"fwd/kernel$", P(None, "model")),       # LM vocab head
    (r"fwd/bias$", P("model")),
    (r"fn_2/kernel$", P(None, "model")),      # generator vocab head
]


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)


def param_shardings(params, mesh: Mesh, rules=None):
    """NamedSharding tree for a param pytree: TP rules where they match (and
    the mesh has a model axis > 1), replicated otherwise."""
    rules = TP_RULES if rules is None else rules
    tp_on = mesh.shape.get("model", 1) > 1

    def spec_for(path, leaf):
        s = _path_str(path)
        if tp_on:
            for pat, spec in rules:
                if re.search(pat, s):
                    # guard: the sharded dim must divide evenly
                    dims = [d for d in spec if d is not None]
                    ok = True
                    for axis_i, d in enumerate(spec):
                        if d is not None and leaf.shape[axis_i] % mesh.shape[d] != 0:
                            ok = False
                    if ok:
                        return NamedSharding(mesh, spec)
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec_for, params)


def global_put(tree, shardings):
    """``jax.device_put(tree, shardings)`` that also works under multi-
    process execution (``jax.process_count() > 1``), where a plain
    device_put of a host array onto a sharding spanning non-addressable
    devices is not allowed. Every process must hold the SAME full host
    values (true for seeded inits and replicated state);
    ``jax.make_array_from_callback`` then hands each process exactly its
    addressable shards. Single-process: identical to device_put."""
    if jax.process_count() == 1:
        return jax.device_put(tree, shardings)

    def put(x, sh):
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])

    return jax.tree.map(put, tree, shardings)


def replicate(tree, mesh: Mesh):
    return global_put(tree, jax.tree.map(
        lambda _: NamedSharding(mesh, P()), tree))


def shard_params(params, mesh: Mesh, rules=None):
    return global_put(params, param_shardings(params, mesh, rules))


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place a dict of host numpy arrays onto the mesh, sharded over the batch
    (leading) axis. Batch sizes must divide the data-axis size — the pipeline
    pads partial batches, so this holds by construction.

    Topology contract (SURVEY §2.6 "per-host data sharding"): with ONE
    process (every single-host topology incl. v4-8/v5e-8, and this repo's CI
    meshes) the full global batch is device_put from this host. With
    ``jax.process_count() > 1`` (multi-slice / multi-host), each process must
    feed only its LOCAL shard of the global batch — the pipeline on host h
    yields rows [h*B/H, (h+1)*B/H) of the global batch, and
    :func:`shard_batch_multihost` assembles the global array from the
    process-local pieces without any cross-host gather."""
    if jax.process_count() > 1:
        return shard_batch_multihost(batch, mesh)
    out = {}
    for k, v in batch.items():
        if not isinstance(v, jax.Array):
            # np.asarray on a jax array would FETCH it to host — device-
            # resident values (e.g. Sinkhorn WMD labels) go straight to
            # device_put, which reshards without a host round-trip
            v = np.asarray(v)
        out[k] = jax.device_put(v, batch_sharding(mesh, v.ndim))
    return out


def stacked_batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Sharding for a (k, B, ...) super-batch: the megastep scan axis k is
    replicated (every device walks all k steps), the batch axis B is data-
    sharded exactly like :func:`batch_sharding`."""
    return NamedSharding(mesh, P(None, "data", *([None] * (ndim - 2))))


def shard_stacked_batch(batch: dict, mesh: Mesh) -> dict:
    """:func:`shard_batch` for stacked (k, B, ...) super-batches (the
    optimize megastep, train/optimize.py): axis 0 is the device-side scan
    over k consecutive training batches, axis 1 the data-parallel batch.
    Multi-host: each process holds its local rows of axis 1 for all k steps."""
    out = {}
    for k, v in batch.items():
        if jax.process_count() > 1:
            v = np.asarray(v)
            out[k] = jax.make_array_from_process_local_data(
                stacked_batch_sharding(mesh, v.ndim), v)
            continue
        if not isinstance(v, jax.Array):
            v = np.asarray(v)
        out[k] = jax.device_put(v, stacked_batch_sharding(mesh, v.ndim))
    return out


def shard_batch_multihost(batch: dict, mesh: Mesh) -> dict:
    """Multi-host batch placement: ``batch`` holds this process's LOCAL rows
    (global_batch / process_count of them); the returned jax.Arrays are
    GLOBAL views assembled per-shard via
    ``jax.make_array_from_process_local_data`` — each host only ever
    materializes its own slice, which is what makes multi-slice input
    pipelines scale (no host broadcasts the full batch).

    Index-domain correctness (tested single-process in
    ``tests/test_parallel.py``): with the batch axis sharded over ``data``,
    process-local row r of host h is global row ``h * local_B + r``."""
    out = {}
    for k, v in batch.items():
        v = np.asarray(v)  # device-resident values must come back to host
        out[k] = jax.make_array_from_process_local_data(
            batch_sharding(mesh, v.ndim), v)
    return out
