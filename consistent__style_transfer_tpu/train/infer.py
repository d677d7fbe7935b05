"""Inference: greedy style transfer of whole splits into ``.tsf`` text files.

Output contract matches the reference exactly (``src/main_optimize.py:157-174``
+ ``:243-255``): for each split in (train, test), decode every sentence to the
*opposite* style with a greedy ``max_len`` rollout, BPE-decode, and route by
the *source* label into ``output/<ds>-<ver>/style.<split>.{0,1}.tsf``.
Transferring the train split exists to feed the NT adversarial classifier
(``evaluate/prepare.py:83-98``).

The decode loop is one jitted scan per batch; batches stream through the mesh
data axis and only the argmax token ids come back to host."""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..data.pipeline import make_batches
from ..parallel.sharding import replicate, shard_batch
from .common import get_corpus, get_mesh


def make_transfer_step(model, beam_size: int = 1):
    from .common import generator_call

    if beam_size > 1:
        from ..models.beam import beam_decode_any

        @jax.jit
        def step(params, x, labels):
            ids, _scores = beam_decode_any(model, params, x, labels, 1 - labels,
                                           beam_size=beam_size)
            return ids

        return step

    @jax.jit
    def step(params, x, labels):
        # mode="greedy": the scan emits token ids directly — no (L, B, V)
        # logits stack in HBM (the decode-path bandwidth win)
        return generator_call(model, params, x, labels, None, 1 - labels,
                              mode="greedy", deterministic=True)

    return step


def transfer_split(cfg: Config, model, params, tokenizer, split: str,
                   mesh=None, step_fn=None) -> dict[int, list[str]]:
    """Greedy-transfer one split; returns {source_label: [decoded lines]} in
    corpus order.

    The loop is fully pipelined against a tunneled chip's latency: host batch
    prep + device_put run in the prefetcher thread, every decode dispatch is
    async (greedy emits only (B, L) int32 ids, so keeping the whole split in
    flight costs ~40 MB at 540k sentences), and result fetch + BPE decode run
    in a small thread pool — the ~37 ms fetch round trips overlap each other
    and the device compute (5.6 ms/batch) instead of serializing. Measured on
    the 541k-sentence transfer: 279 sent/s (host params re-uploaded per
    batch, serial fetch) -> 1438 (device-resident params, 1-deep pipeline)
    -> threaded fetch (this version)."""
    from concurrent.futures import ThreadPoolExecutor

    from ..data.prefetch import DevicePrefetcher

    mesh = mesh or get_mesh(cfg)
    step_fn = step_fn or make_transfer_step(model, cfg.beam_size)
    corpus = get_corpus(cfg, split, tokenizer)
    it = make_batches(corpus, cfg.batch_size, cfg.max_len, "optimize",
                      shuffle=False, seed=cfg.seed)
    routed: dict[int, list[str]] = {0: [], 1: []}

    def drain(fut, batch):
        tokens = np.asarray(fut)  # forces the (async) device result
        labels = batch["labels"]
        out: tuple[list[str], list[str]] = ([], [])
        for i in range(batch.valid):
            out[int(labels[i])].append(tokenizer.decode(tokens[i].tolist()))
        return out

    with ThreadPoolExecutor(max_workers=3) as ex:
        chunks = [
            ex.submit(drain, step_fn(params, arrays["x"], arrays["labels"]),
                      batch)
            for batch, arrays in DevicePrefetcher(it, mesh)
        ]
        for c in chunks:  # corpus order preserved
            part = c.result()
            routed[0] += part[0]
            routed[1] += part[1]
    return routed


def write_tsf(cfg: Config, split: str, routed: dict[int, list[str]]) -> list[str]:
    os.makedirs(cfg.run_out_dir, exist_ok=True)
    paths = []
    for label in (0, 1):
        path = f"{cfg.run_out_dir}/style.{split}.{label}.tsf"
        with open(path, "w", encoding="utf-8") as f:
            for line in routed[label]:
                f.write(line + "\n")
        paths.append(path)
    return paths


def run_inference(cfg: Config, model, params, tokenizer,
                  splits=("train", "test")) -> list[str]:
    mesh = get_mesh(cfg)
    # params arrive as HOST arrays from the checkpoint loader; place them on
    # the mesh ONCE. Passing host arrays into the jitted step re-uploads the
    # full parameter set every call — ~tens of MB/batch through a tunneled
    # link, which dominated the whole-split decode wall-clock before this.
    params = replicate(params, mesh)
    step_fn = make_transfer_step(model, cfg.beam_size)
    out_paths: list[str] = []
    for split in splits:
        routed = transfer_split(cfg, model, params, tokenizer, split,
                                mesh=mesh, step_fn=step_fn)
        out_paths += write_tsf(cfg, split, routed)
    return out_paths
