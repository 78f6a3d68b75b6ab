"""Host-side batch pipeline: static-shape uint8 batches with validity masks.

Replaces the reference's torch DataLoader + per-sample PIL transforms
(reference: src/dataset.py:55-90) with a TPU-friendly design:

* every batch has a *static* shape (XLA compiles one graph): the final
  partial batch is padded and accompanied by a (B,) validity mask; all
  downstream statistics are mask-weighted so semantics match the reference's
  variable-size final batch exactly,
* batches are raw uint8 (4x cheaper H2D than float32); normalization and
  train-time random horizontal flip run on device inside the jitted step
  (data/transforms.py),
* a background thread prefetches and collates ahead of the step loop,
* an in-memory sample cache (dataset fits trivially in host RAM) removes
  disk I/O from the steady state.

Iteration yields dicts: {images: (B,V,H,W,C) u8, labels: (B,) i32,
indices: (B,) i32, mask: (B,) f32, size: int}.
"""

from __future__ import annotations

import queue
import threading
from typing import Sequence

import numpy as np


def device_prefetch(iterator, depth: int = 2, put=None):
    """Stage host batches onto the device ``depth`` ahead of consumption so
    H2D transfers overlap with the running step (the reference blocks on a
    synchronous ``.to(device)`` per batch, reference: src/framework.py:168).

    ``put`` overrides the placement function (e.g. a mesh-sharding
    device_put for data-parallel runs)."""
    import collections

    import jax

    queue = collections.deque()
    put = put or jax.device_put

    def stage(batch):
        # "indices" and "size" stay on host: they are only consumed by the
        # host-side history accumulation, never by the jitted step.
        staged = dict(batch)
        for key in ("images", "labels", "mask"):
            if key in staged:
                staged[key] = put(staged[key])
        return staged

    it = iter(iterator)
    try:
        for _ in range(depth):
            queue.append(stage(next(it)))
    except StopIteration:
        pass
    while queue:
        out = queue.popleft()
        try:
            queue.append(stage(next(it)))
        except StopIteration:
            pass
        yield out


class BatchPipeline:
    def __init__(
        self,
        dataset,
        indices: Sequence[int],
        batch_size: int,
        *,
        shuffle: bool = False,
        seed: int = 777,
        prefetch: int = 2,
    ):
        self.dataset = dataset
        self.indices = np.asarray(list(indices), np.int64)
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.prefetch = prefetch
        self.seed = seed
        # Epoch counter drives a stateless per-epoch shuffle: order is a pure
        # function of (seed, epoch), so a resumed run replays the exact same
        # data order an uninterrupted run would have seen.  The trainer
        # advances it via set_epoch(); bare iteration auto-increments.
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = int(epoch)

    def __len__(self):
        """Number of batches per epoch (torch DataLoader drop_last=False)."""
        n = len(self.indices)
        return (n + self.batch_size - 1) // self.batch_size

    @property
    def num_samples(self):
        return len(self.indices)

    def _epoch_order(self) -> np.ndarray:
        if self.shuffle:
            rng = np.random.default_rng((self.seed, self.epoch))
            return rng.permutation(self.indices)
        return self.indices

    def _collate(self, batch_indices: np.ndarray) -> dict:
        b = self.batch_size
        size = len(batch_indices)
        items = [self.dataset[int(i)] for i in batch_indices]
        samples = [it[1] for it in items]
        # Native GIL-free gather+pad (csrc/fastio.cc); numpy fallback.
        from ..utils.native import collate_u8

        imgs = collate_u8(samples, b)
        if imgs is None:
            imgs = np.stack(samples)  # (size, V, ..., C)
            if size < b:
                imgs = np.concatenate([imgs, np.zeros((b - size,) + imgs.shape[1:], imgs.dtype)])
        labels = np.array([it[2] for it in items], np.int32)
        idxs = np.array([it[0] for it in items], np.int32)
        if size < b:  # pad to static shape; mask marks real rows
            pad = b - size
            labels = np.concatenate([labels, np.zeros((pad,), np.int32)])
            idxs = np.concatenate([idxs, np.full((pad,), -1, np.int32)])
        mask = np.zeros((b,), np.float32)
        mask[:size] = 1.0
        return {"images": imgs, "labels": labels, "indices": idxs, "mask": mask, "size": size}

    def __iter__(self):
        self.epoch += 1
        order = self._epoch_order()
        n = len(order)
        if n == 0:
            return
        starts = range(0, n, self.batch_size)

        if self.prefetch <= 0:
            for s in starts:
                yield self._collate(order[s : s + self.batch_size])
            return

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        stop = threading.Event()  # consumer gone: unblock + end the producer
        failure = []

        def _put(item) -> bool:
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                for s in starts:
                    if not _put(self._collate(order[s : s + self.batch_size])):
                        return
            except BaseException as e:  # surfaced to the consumer below
                failure.append(e)
            finally:
                _put(sentinel)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is sentinel:
                    break
                yield item
        finally:
            # Early consumer exit (steps < len(self)) or generator close:
            # release the producer so it does not stay blocked on a full
            # queue holding prefetched batches for the rest of the process.
            stop.set()
        if failure:
            raise RuntimeError("BatchPipeline producer thread failed") from failure[0]
