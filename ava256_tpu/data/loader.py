# Copyright (c) ava256_tpu contributors.
# All rights reserved.
#
# This source code is licensed under the license found in the
# LICENSE file in the root directory of this source tree.
"""Per-host sharded, background-prefetched data loading.

TPU-native replacement for the reference's DistributedSampler + DataLoader
(reference: ddp-train.py:134-144): each host iterates its own shard of a
(optionally shuffled) global index permutation and workers overlap zip/image
decode with device compute. Failed samples are dropped at collate
(None-skipping), matching the reference's data-level fault tolerance.

Workers are threads by default (PIL/numpy release the GIL for the heavy
decode/resize work); ``use_processes=True`` switches to a spawned process
pool like the reference's 4 DataLoader worker processes (reference:
ddp-train.py:139) for hosts where Python-side per-item work dominates.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Dict, Iterator, Optional

import numpy as np

from ava256_tpu.data.dataset import none_collate

_WORKER_DATASET = None


def _pool_init(dataset):
    global _WORKER_DATASET
    _WORKER_DATASET = dataset


def _pool_fetch(batch_indices):
    return none_collate([_WORKER_DATASET[int(j)] for j in batch_indices])


def device_prefetch(iterable, fn: Callable, depth: int = 2):
    """Map ``fn`` (typically host->device upload + sharding) over ``iterable``
    in a background thread so the transfer of batch i+1 overlaps the
    consumer's compute on batch i. ``None`` items (failed collates) are
    skipped. JAX dispatch is thread-safe; ``device_put`` from the feeder
    thread returns immediately and the arrays materialize asynchronously,
    so the consumer's step never waits on the wire."""
    q: "queue.Queue" = queue.Queue(maxsize=max(1, depth))
    end = object()
    errs = []
    closed = threading.Event()

    def put(item) -> bool:
        # Bounded put that gives up if the consumer abandoned the generator
        # (train loop breaking at maxiter) — otherwise the feeder would pin
        # depth+1 uploaded device batches for process lifetime.
        while not closed.is_set():
            try:
                q.put(item, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def feed():
        try:
            for item in iterable:
                if item is None:
                    continue
                if not put(fn(item)):
                    return
        except BaseException as e:  # surface loader errors in the consumer
            errs.append(e)
        finally:
            put(end)

    threading.Thread(target=feed, daemon=True).start()
    try:
        while True:
            item = q.get()
            if item is end:
                if errs:
                    raise errs[0]
                return
            yield item
    finally:
        closed.set()
        # Drop any queued device batches so their buffers free promptly.
        while True:
            try:
                q.get_nowait()
            except queue.Empty:
                break


class ShardedLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        num_workers: int = 2,
        host_id: int = 0,
        num_hosts: int = 1,
        drop_last: bool = True,
        collate: Callable = none_collate,
        prefetch: int = 4,
        use_processes: bool = False,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.num_workers = max(1, num_workers)
        self.host_id = host_id
        self.num_hosts = num_hosts
        self.drop_last = drop_last
        self.collate = collate
        self.prefetch = prefetch
        self.epoch = 0
        self._skip = 0
        self._pool = None
        if use_processes:
            import multiprocessing as mp

            ctx = mp.get_context("spawn")
            self._pool = ctx.Pool(
                self.num_workers, initializer=_pool_init, initargs=(dataset,)
            )

    def set_position(self, global_batch_index: int) -> None:
        """Fast-forward so the next ``__iter__`` resumes the deterministic
        batch sequence at the given global batch index (checkpoint resume:
        the shuffle is a pure function of (seed, epoch), so epoch + intra-
        epoch offset reproduce the exact data order of an uninterrupted
        run)."""
        per = len(self)
        self.epoch = global_batch_index // per
        self._skip = global_batch_index % per

    def _epoch_indices(self) -> np.ndarray:
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            rng.shuffle(idx)
        # Host shard: contiguous strided split like DistributedSampler
        return idx[self.host_id :: self.num_hosts]

    def __iter__(self) -> Iterator[Optional[Dict[str, Any]]]:
        indices = self._epoch_indices()
        self.epoch += 1
        nb = len(indices) // self.batch_size
        if not self.drop_last and len(indices) % self.batch_size:
            nb += 1
        batches = [
            indices[i * self.batch_size : (i + 1) * self.batch_size] for i in range(nb)
        ]
        if self._skip:
            batches = batches[self._skip :]
            self._skip = 0

        if self._pool is not None:
            # process pool: imap preserves batch order; the pool pipeline
            # depth provides the prefetch overlap
            yield from self._pool.imap(_pool_fetch, batches)
            return

        job_q: "queue.Queue" = queue.Queue()
        results: Dict[int, Any] = {}
        cond = threading.Condition()
        served_box = [0]  # next batch index the consumer needs

        for i, b in enumerate(batches):
            job_q.put((i, b))

        def worker():
            while True:
                try:
                    i, b = job_q.get_nowait()
                except queue.Empty:
                    return
                # Bound in-flight batches to the prefetch depth — but never
                # block the batch the consumer is waiting on (otherwise
                # faster workers can fill the window with later indices and
                # deadlock the pipeline).
                with cond:
                    while len(results) >= self.prefetch and i != served_box[0]:
                        cond.wait()
                batch = self.collate([self.dataset[int(j)] for j in b])
                with cond:
                    results[i] = batch
                    cond.notify_all()

        threads = [
            threading.Thread(target=worker, daemon=True) for _ in range(self.num_workers)
        ]
        for t in threads:
            t.start()

        for served in range(len(batches)):
            with cond:
                while served not in results:
                    cond.wait()
                batch = results.pop(served)
                served_box[0] = served + 1
                cond.notify_all()
            yield batch

    def __len__(self) -> int:
        n = len(self._epoch_indices())
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)
