"""Device feeder: background batch assembly + double-buffered device_put.

Replaces the reference's DataLoader-worker + prefetch-thread stack
(`DataLoaderX`, reference src/tools/data_loader.py:8-10): a host thread
assembles fixed-shape numpy batches ahead of consumption and `device_put`s
them (sharded over the mesh when given one), so the TPU never waits on host
I/O - the JAX equivalent of pinned-memory double buffering.
"""
from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator

import jax
import numpy as np

from xggm_tpu.data.datasets import GraphBatchDataset
from xggm_tpu.parallel.mesh import batch_sharding, pad_batch_to


class Feeder:
    def __init__(self, dataset: GraphBatchDataset, batch_size: int,
                 shuffle: bool = False, drop_last: bool = False,
                 seed: int = 9595, mesh=None, prefetch_depth: int = 2,
                 feats_dtype=None, process_index: int = 0,
                 process_count: int = 1):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.mesh = mesh
        self.prefetch_depth = prefetch_depth
        # Cast the (dominant) visual features on the HOST before transfer -
        # when the model computes in bfloat16 the cast happens on entry to
        # the first projection anyway, so shipping fp32 bytes over the
        # host->device link is pure waste (2x the transfer volume).
        self.feats_dtype = feats_dtype
        # Multi-host SPMD (parallel/distributed.py): batch_size stays the
        # GLOBAL batch; every process iterates the same index sequence
        # (same dataset + seed) but assembles only its contiguous slice.
        if process_count > 1 and mesh is None:
            raise ValueError("multi-process feeding requires a mesh")
        self.process_index = process_index
        self.process_count = process_count
        self._epoch = 0
        self._skip_next = 0

    def set_position(self, epoch: int, skip_batches: int = 0) -> None:
        """Resume support: align the per-epoch shuffle stream to `epoch` and
        drop the first `skip_batches` index batches of the NEXT iteration
        (they were already consumed before a preemption; skipping happens
        before assembly, so fast-forward costs nothing)."""
        self._epoch = epoch
        self._skip_next = skip_batches

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _index_batches(self) -> Iterator[np.ndarray]:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self._epoch)
            rng.shuffle(order)
        stop = (n // self.batch_size) * self.batch_size if self.drop_last else n
        for start in range(0, stop, self.batch_size):
            yield order[start:start + self.batch_size]

    def _place(self, batch: Dict[str, np.ndarray]):
        if self.mesh is not None:
            sh = batch_sharding(self.mesh)
            return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
        return jax.tree.map(jax.device_put, batch)

    def __iter__(self):
        """Yields (question_ids, device_batch, valid_mask). The final partial
        batch is padded to batch_size with a validity mask (SPMD-friendly
        static shapes; reference relied on DataParallel ragged gather)."""
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch_depth)
        SENTINEL = object()
        skip, self._skip_next = self._skip_next, 0

        def producer():
            try:
                for j, idx in enumerate(self._index_batches()):
                    if j < skip:
                        continue
                    qids = self.dataset.question_ids(idx)
                    if self.process_count > 1:
                        # pad the INDEX list (repeating the last row; the
                        # mask invalidates it) and assemble only this
                        # process's contiguous chunk; placement joins the
                        # chunks into global P('data') arrays
                        from xggm_tpu.parallel.distributed import (
                            local_batch_to_global, process_slice)
                        mask = np.zeros((self.batch_size,), np.bool_)
                        mask[: len(idx)] = True
                        fetch_idx = process_slice(
                            np.concatenate(
                                [idx, np.repeat(idx[-1:],
                                                self.batch_size - len(idx))]),
                            self.process_index, self.process_count)
                        place = (lambda b: local_batch_to_global(
                            self.mesh, b, self.batch_size))
                    else:
                        fetch_idx, place = idx, self._place
                    batch = self.dataset.get_batch(fetch_idx)
                    if self.feats_dtype is not None:
                        batch["feats"] = batch["feats"].astype(
                            self.feats_dtype)
                    if self.process_count == 1:
                        batch, mask = pad_batch_to(batch, self.batch_size)
                    # device placement happens HERE, on the producer thread:
                    # host->device transfer of batch N+1 overlaps the
                    # device compute of batch N (jax dispatch is async)
                    q.put((qids, place(batch), mask))
            except BaseException as e:  # noqa: BLE001 - surfaced below
                # a swallowed producer error would silently truncate the
                # epoch; hand it to the consumer thread instead
                q.put(e)
            else:
                q.put(SENTINEL)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is SENTINEL:
                break
            if isinstance(item, BaseException):
                t.join()
                raise RuntimeError(
                    "feeder producer thread failed while assembling a "
                    "batch") from item
            yield item
        t.join()
        self._epoch += 1


class Prefetcher:
    """One-batch-lookahead pull API (reference `DataPrefetcher`,
    src/tools/data_loader.py:13-31: eagerly holds the next batch;
    `.next()` returns it and preloads, returning None once exhausted).

    The Feeder already overlaps assembly/transfer on its producer thread;
    this wrapper only reproduces the reference's pull-style calling
    convention for code written against it."""

    def __init__(self, loader):
        self._it = iter(loader)
        self._preload()

    def _preload(self):
        try:
            self.batch = next(self._it)
        except StopIteration:
            self.batch = None

    def next(self):
        batch = self.batch
        if batch is not None:
            self._preload()
        return batch


class MultiEpochsFeeder(Feeder):
    """Persistent-stream variant (reference `MultiEpochsDataLoader` +
    `_RepeatSampler`, src/tools/data_loader.py:34-56): ONE producer thread
    streams epoch after epoch through one queue, so per-epoch iteration
    never re-pays worker/thread startup; each `__iter__` yields exactly
    len(self) batches (one epoch) and leaves the stream running. The
    per-epoch shuffle stream still advances (seed + epoch), matching
    Feeder's ordering epoch-for-epoch."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self._q = None
        self._thread = None

    def _producer_loop(self):
        try:
            while True:
                for idx in self._index_batches():
                    qids = self.dataset.question_ids(idx)
                    batch = self.dataset.get_batch(idx)
                    if self.feats_dtype is not None:
                        batch["feats"] = batch["feats"].astype(
                            self.feats_dtype)
                    batch, mask = pad_batch_to(batch, self.batch_size)
                    self._q.put((qids, self._place(batch), mask))
                self._epoch += 1
        except BaseException as e:  # noqa: BLE001 - surfaced in __iter__
            self._q.put(e)

    def __iter__(self):
        if self.process_count > 1:
            raise NotImplementedError(
                "MultiEpochsFeeder is single-process; use Feeder for "
                "multi-host runs")
        if self._thread is None:
            self._q = queue.Queue(maxsize=self.prefetch_depth)
            self._thread = threading.Thread(
                target=self._producer_loop, daemon=True)
            self._thread.start()
        for _ in range(len(self)):
            item = self._q.get()
            if isinstance(item, BaseException):
                raise RuntimeError(
                    "feeder producer thread failed while assembling a "
                    "batch") from item
            yield item
