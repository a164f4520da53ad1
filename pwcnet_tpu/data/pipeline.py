"""Torch-free host input pipeline with device prefetch.

Replaces the reference's torch DataLoader + per-step feed_dict copy
(train.py:36-41,125-127) with:

- `DataLoader`: threaded sample decoding (PIL/np release the GIL) with
  batch-ahead prefetching, shuffling, and drop_last;
- `device_prefetch`: keeps N batches in flight on-device (double-buffered
  HBM transfers, optionally placed under a `jax.sharding.NamedSharding` so
  each batch lands already sharded across the mesh's data axis).

The loader yields ``(images, flows)`` host batches:
``images`` (B, 2, H, W, 3) float32 in [0, 1] (the /255 normalization is
folded in here instead of the training loop), ``flows`` (B, H, W, 2)
float32 pixels.
"""

from __future__ import annotations

import collections
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterable, Iterator, Optional

import numpy as np

__all__ = ["DataLoader", "device_prefetch"]


class DataLoader:
    """Iterates mini-batches of a FlowDataset with background decoding."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        num_workers: int = 2,
        drop_last: bool = True,
        seed: int = 0,
        prefetch_batches: int = 2,
        normalize: bool = True,
    ):
        self.dataset = dataset
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.num_workers = max(1, int(num_workers))
        self.drop_last = drop_last
        self.prefetch_batches = max(1, int(prefetch_batches))
        self.normalize = normalize
        self._rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batch_indices(self):
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self._rng.shuffle(order)
        bs = self.batch_size
        end = len(order) - (len(order) % bs) if self.drop_last else len(order)
        for i in range(0, end, bs):
            chunk = order[i : i + bs]
            if chunk.size:
                yield chunk

    def _assemble(self, futures):
        items = [f.result() for f in futures]
        images = np.stack([it[0] for it in items])  # (B, 2, H, W, 3) uint8
        flows = np.stack([it[1] for it in items])  # (B, H, W, 2) f32
        if self.normalize:
            images = images.astype(np.float32) / 255.0
        return images, flows

    def __iter__(self) -> Iterator[tuple[np.ndarray, np.ndarray]]:
        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            pending = collections.deque()
            batches = self._batch_indices()
            # keep `prefetch_batches` batches of sample-futures in flight
            for _ in range(self.prefetch_batches):
                idxs = next(batches, None)
                if idxs is None:
                    break
                pending.append(
                    [pool.submit(self.dataset.__getitem__, int(i)) for i in idxs]
                )
            while pending:
                futures = pending.popleft()
                idxs = next(batches, None)
                if idxs is not None:
                    pending.append(
                        [
                            pool.submit(self.dataset.__getitem__, int(i))
                            for i in idxs
                        ]
                    )
                yield self._assemble(futures)


def device_prefetch(
    iterator: Iterable,
    size: int = 2,
    sharding: Optional[object] = None,
) -> Iterator:
    """Keep ``size`` batches resident on device ahead of consumption.

    Host->HBM transfers are issued from a background thread so decode,
    transfer, and compute overlap; with a NamedSharding each batch is
    placed directly into its sharded layout (per-device slices go over
    PCIe once, no host-side gather).
    """
    import jax

    def _put(batch):
        if sharding is not None:
            return jax.tree_util.tree_map(
                lambda x: jax.device_put(x, sharding), batch
            )
        return jax.tree_util.tree_map(jax.device_put, batch)

    q: queue.Queue = queue.Queue(maxsize=size)
    _SENTINEL = object()

    def _producer():
        try:
            for batch in iterator:
                q.put(_put(batch))
        finally:
            q.put(_SENTINEL)

    thread = threading.Thread(target=_producer, daemon=True)
    thread.start()
    while True:
        item = q.get()
        if item is _SENTINEL:
            break
        yield item
