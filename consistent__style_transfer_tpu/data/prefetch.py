"""Host-side batch prefetcher: overlaps collate work (noising, WMD labels)
and host->device transfer with device compute — the TPU-native equivalent of
the reference's torch ``DataLoader`` worker processes.

A background thread walks the :class:`~.pipeline.BatchIterator`, runs the
collate, and `jax.device_put`s each batch with its mesh sharding into a small
bounded queue; the training loop pops ready-on-device batches.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator

from ..parallel.sharding import shard_batch
from .pipeline import Batch


class DevicePrefetcher:
    """Iterate `(Batch, device_arrays)` with `depth` batches in flight."""

    def __init__(self, iterator, mesh, depth: int = 2, shard_fn=None):
        self.iterator = iterator
        self.mesh = mesh
        self.depth = depth
        # shard_fn(batch_arrays, mesh) -> device arrays; default = leading-
        # axis batch sharding. The megastep passes shard_stacked_batch for
        # its (k, B, ...) super-batches.
        self.shard_fn = shard_batch if shard_fn is None else shard_fn

    def __iter__(self) -> Iterator[tuple[Batch, dict]]:
        q: queue.Queue = queue.Queue(maxsize=self.depth)
        sentinel = object()
        errors: list[BaseException] = []

        def producer():
            try:
                for batch in self.iterator:
                    q.put((batch, self.shard_fn(batch.arrays, self.mesh)))
            except BaseException as e:  # surface in consumer
                errors.append(e)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            yield item
        t.join()
        if errors:
            raise errors[0]

    def __len__(self) -> int:
        return len(self.iterator)
