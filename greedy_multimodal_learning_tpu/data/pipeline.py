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


class DeviceCachePipeline(BatchPipeline):
    """Device-resident corpus: the split's whole uint8 image stack is
    uploaded to HBM ONCE; every batch is then assembled *on device* by a
    tiny jitted index gather, so steady-state training never moves image
    bytes over the host↔device link again.

    Rationale: the reference re-reads + re-transforms every sample per epoch
    on the host (reference: src/dataset.py:55-90 + src/framework.py:165-169).
    The streaming :class:`BatchPipeline` already reduces that to one uint8
    H2D per batch, but on link-bound deployments the transfer still caps
    end-to-end throughput (PERF.md: 146 samples/s e2e vs 3711 samples/s
    compute at B=128 over a ~37 MB/s tunnel) while the operative two-view
    uint8 corpus fits in HBM many times over.  With the cache, the per-step
    upload shrinks from ``B*V*H*W*C`` bytes to ``B`` int32 row ids + ``B``
    float32 mask — the batch itself never exists on the host.

    Semantics are *identical* to streaming (tested batch-for-batch equal):

    * the per-epoch order is the inherited ``_epoch_order()`` — a pure
      function of (seed, epoch) — so resume replays the exact same order,
    * partial final batches are padded with a reserved all-zero corpus row
      (images zero, label 0, index -1, mask 0), matching ``_collate``'s
      zero-padding byte-for-byte,
    * batches still yield host ``indices``/``size`` for history recording;
      ``images``/``labels``/``mask`` are committed device arrays, which
      ``device_prefetch``'s default ``jax.device_put`` passes through
      without a copy.

    The corpus upload is budget-checked against the device's free memory at
    first iteration; if it does not fit (or the upload fails), the pipeline
    logs a warning and PERMANENTLY falls back to the inherited streaming
    iterator.

    Multi-host: the cache shards naturally.  Each process's pipeline already
    holds only its process-local index slice (parallel/multihost.py
    ``process_local_indices``), so each process uploads exactly its rows of
    the global corpus to its FIRST LOCAL device and gathers its local batch
    there; the Trainer's multi-host put (``global_batch_from_local``) then
    assembles the globally-sharded batch from the per-process device-resident
    shards — image bytes cross the host link once per run (the upload), never
    per step.  Byte-for-byte equality with the streamed multi-host path is
    pinned by tests/test_pipeline_cache.py's 2-process test.
    """

    #: fraction of the device's free memory the corpus may occupy
    budget_frac = 0.5
    #: budget when the backend reports no memory stats (CPU/interpret)
    fallback_budget_bytes = 2 * 1024**3

    def __init__(self, dataset, indices, batch_size, **kw):
        super().__init__(dataset, indices, batch_size, **kw)
        self._corpus = None  # (images, labels) device arrays after upload
        self._row_of = None  # dataset index -> corpus row LUT
        self._streaming = False  # budget fallback latch
        self._gather = None
        # Optional mesh adoption (adopt_mesh_for_cache): the corpus is
        # replicated over the mesh and the gather emits batches already
        # sharded P('data') — no device-0 pinning, no per-step reshard hop.
        self.mesh = None

    # -- corpus construction ------------------------------------------------

    def _corpus_nbytes(self) -> int:
        if len(self.indices) == 0:
            return 0
        _, img, _ = self.dataset[int(self.indices[0])]
        return (len(self.indices) + 1) * img.nbytes  # +1 pad row

    def _budget_ok(self, device) -> bool:
        import logging

        nbytes = self._corpus_nbytes()
        try:
            stats = device.memory_stats()
        except Exception:
            stats = None
        if stats and stats.get("bytes_limit"):
            free = stats["bytes_limit"] - stats.get("bytes_in_use", 0)
            ok = nbytes <= self.budget_frac * free
            if not ok:
                logging.getLogger(__name__).warning(
                    "device cache: corpus %.1f MB exceeds %.0f%% of free device "
                    "memory (%.1f MB) — falling back to streaming batches",
                    nbytes / 1e6, 100 * self.budget_frac, free / 1e6,
                )
            return ok
        ok = nbytes <= self.fallback_budget_bytes
        if not ok:  # the fallback must be as loud as the stats-based branch
            logging.getLogger(__name__).warning(
                "device cache: corpus %.1f MB exceeds the %.0f MB fallback "
                "budget (backend reports no memory stats) — falling back to "
                "streaming batches",
                nbytes / 1e6, self.fallback_budget_bytes / 1e6,
            )
        return ok

    def _ensure_corpus(self) -> bool:
        """Upload once; returns False (and latches streaming) on any failure."""
        if self._corpus is not None:
            return True
        if self._streaming or len(self.indices) == 0:
            return False
        import logging

        import jax
        import jax.numpy as jnp

        logger = logging.getLogger(__name__)
        try:
            # first *local* device: under multi-host, jax.devices()[0] can be
            # another process's chip — uploads must target an addressable one
            device = jax.local_devices()[0]
            # Corpus assembly fills the dataset's host sample cache, which
            # the cached iteration path never reads again; remember which
            # entries we add so they can be released after a successful
            # upload (keeps pre-warmed entries for the streaming fallback).
            # Snapshot BEFORE the budget check: _corpus_nbytes probes one
            # sample, and that probe entry must be released too.
            host_cache = getattr(self.dataset, "_cache", None)
            pre_cached = set(host_cache) if host_cache is not None else None
            if not self._budget_ok(device):
                self._streaming = True
                return False
            items = [self.dataset[int(i)] for i in self.indices]
            imgs = np.stack([it[1] for it in items])
            # reserved all-zero pad row (matches _collate's zero padding)
            imgs = np.concatenate([imgs, np.zeros((1,) + imgs.shape[1:], imgs.dtype)])
            labels = np.concatenate([np.array([it[2] for it in items], np.int32), [0]])
            self._pad_row = len(items)
            lut = np.zeros(int(self.indices.max()) + 1, np.int32)
            lut[self.indices] = np.arange(len(items), dtype=np.int32)
            self._row_of = lut
            if self.mesh is not None and self.mesh.size > 1:
                # Mesh mode (single-process multi-device, BASELINE config 5):
                # replicate the corpus over the mesh — per-device HBM cost is
                # identical to the pinned single-device upload, which the
                # budget check above already cleared — and have the jitted
                # gather emit batches SHARDED over the data axis.  Each
                # device then slices only its own batch rows locally: the
                # input path is collective-free (a row-sharded corpus would
                # instead force GSPMD to all-gather it at every step, since
                # the gather indexes into the sharded axis).
                from jax.sharding import NamedSharding, PartitionSpec as P

                replicated = NamedSharding(self.mesh, P())
                batch_sharded = NamedSharding(self.mesh, P("data"))
                dimg = jax.device_put(imgs, replicated)
                dlab = jax.device_put(labels, replicated)
                dimg.block_until_ready()
                self._corpus = (dimg, dlab)
                self._gather = jax.jit(
                    lambda img, lab, rows, mask: (img[rows], lab[rows], mask),
                    out_shardings=(batch_sharded, batch_sharded, batch_sharded),
                )
                logger.info(
                    "device cache: %d samples (%.1f MB uint8) replicated over "
                    "the %d-device mesh; batches gathered pre-sharded P('data')",
                    len(items), imgs.nbytes / 1e6, self.mesh.size,
                )
            else:
                dimg = jax.device_put(imgs, device)
                dlab = jax.device_put(labels, device)
                dimg.block_until_ready()
                self._corpus = (dimg, dlab)
                # explicit args (not closure constants): XLA must not bake
                # the corpus into the executable as a literal
                self._gather = jax.jit(
                    lambda img, lab, rows, mask: (img[rows], lab[rows], mask)
                )
                logger.info(
                    "device cache: %d samples (%.1f MB uint8) resident on %s",
                    len(items), imgs.nbytes / 1e6, device,
                )
            if host_cache is not None and pre_cached is not None:
                # upload succeeded (either layout): don't hold a second
                # (host) copy of the split for the process lifetime
                for k in [k for k in host_cache if k not in pre_cached]:
                    del host_cache[k]
            return True
        except Exception:
            logger.warning(
                "device cache: corpus upload failed — falling back to "
                "streaming batches", exc_info=True,
            )
            self._streaming = True
            return False

    # -- iteration ----------------------------------------------------------

    def __iter__(self):
        if not self._ensure_corpus():
            yield from super().__iter__()
            return
        self.epoch += 1
        order = self._epoch_order()
        n = len(order)
        b = self.batch_size
        dimg, dlab = self._corpus
        for s in range(0, n, b):
            chunk = order[s : s + b]
            size = len(chunk)
            rows = self._row_of[chunk]
            idxs = np.asarray(chunk, np.int32)
            mask = np.ones((b,), np.float32)
            if size < b:
                rows = np.concatenate([rows, np.full((b - size,), self._pad_row, np.int32)])
                idxs = np.concatenate([idxs, np.full((b - size,), -1, np.int32)])
                mask[size:] = 0.0
            images, labels, dmask = self._gather(dimg, dlab, rows, mask)
            yield {
                "images": images,
                "labels": labels,
                "indices": idxs,
                "mask": dmask,
                "size": size,
            }


def adopt_mesh_for_cache(pipelines, mesh) -> None:
    """Upgrade not-yet-uploaded :class:`DeviceCachePipeline`\\ s to the
    mesh-aware cache: corpus replicated over the mesh, batches gathered
    pre-sharded P('data') — removing the device-0 pinning and the per-step
    device-to-device reshard hop the pinned cache would otherwise pay.

    Loaders are built before the loop knows its mesh (entries.py builds
    data first, training_loop builds the mesh), so the loop calls this once
    the mesh exists; the corpus uploads lazily at first iteration, after
    adoption.  Multi-host runs keep the per-process shard path (each
    process's batch leaves are assembled into global arrays by
    ``global_batch_from_local``); already-uploaded pipelines keep their
    pinned corpus and are flagged."""
    import logging

    if mesh is None or mesh.size <= 1:
        return
    import jax

    if jax.process_count() > 1:
        return
    for pipe in pipelines:
        if not isinstance(pipe, DeviceCachePipeline):
            continue
        if pipe._corpus is not None:
            logging.getLogger(__name__).warning(
                "device cache already uploaded to a single device before the "
                "%d-device mesh existed; batches will be re-sharded per step "
                "— build the mesh before first iteration to avoid this",
                mesh.size,
            )
            continue
        pipe.mesh = mesh


def wrap_device_cache(pipeline: BatchPipeline, enabled="auto") -> BatchPipeline:
    """Upgrade a streaming pipeline to :class:`DeviceCachePipeline`.

    ``enabled``: True / False / "auto" (on unless the memory budget check
    falls back).  Multi-host runs shard the cache per process — each process
    caches exactly its local index slice on its first local device (see the
    class docstring)."""
    if enabled is False:
        return pipeline
    cached = DeviceCachePipeline(
        pipeline.dataset,
        pipeline.indices,
        pipeline.batch_size,
        shuffle=pipeline.shuffle,
        seed=pipeline.seed,
        prefetch=pipeline.prefetch,
    )
    cached.epoch = pipeline.epoch
    return cached
