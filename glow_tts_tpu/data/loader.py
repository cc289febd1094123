"""Batching and host→device prefetch.

Replaces the reference's ``torch.utils.data.DataLoader(num_workers=4,
pin_memory=True)`` (``Train.py:100-123``) with a TPU-style pipeline:

* length-aware bucketing — indices are shuffled, then sorted by mel length
  inside windows of ``sort_factor`` batches, so batches are near-uniform in
  length and bucket-padded shapes stay small (less padding = fewer wasted
  MXU cycles and fewer distinct compiled shapes);
* a background thread assembles the next batches and ``device_put``s them
  (sharded over the mesh's data axis when given one) while the current step
  computes — double buffering host IO against device compute.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Dict, Iterator, Optional, Sequence

import numpy as np


class BatchSampler:
    """``num_shards``/``shard_index`` give per-host data loading on a pod:
    every process applies the same seeded permutation and keeps a disjoint
    stride of it, so the union over hosts covers the dataset exactly once
    per epoch with no coordination traffic."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 sort_factor: int = 8, seed: int = 0,
                 drop_last: bool = True,
                 shard_index: int = 0, num_shards: int = 1):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.sort_factor = sort_factor
        self.seed = seed
        self.drop_last = drop_last
        self.shard_index = shard_index
        self.num_shards = num_shards
        self.epoch = 0

    def __iter__(self) -> Iterator[Sequence[int]]:
        n = len(self.dataset)
        rng = np.random.default_rng(self.seed + self.epoch)
        order = rng.permutation(n) if self.shuffle else np.arange(n)
        if self.num_shards > 1:
            order = order[self.shard_index::self.num_shards]
            n = len(order)
        if self.shuffle and hasattr(self.dataset, 'mel_length'):
            window = self.batch_size * self.sort_factor
            chunks = []
            for start in range(0, n, window):
                chunk = order[start:start + window]
                lengths = np.array(
                    [self.dataset.mel_length(i) for i in chunk])
                chunks.append(chunk[np.argsort(lengths, kind='stable')])
            order = np.concatenate(chunks) if chunks else order
        batches = [order[i:i + self.batch_size]
                   for i in range(0, n, self.batch_size)]
        if self.drop_last and batches and \
                len(batches[-1]) < self.batch_size:
            batches = batches[:-1]
        if self.shuffle:
            rng.shuffle(batches)
        self.epoch += 1
        yield from batches

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.num_shards > 1:
            n = len(range(self.shard_index, n, self.num_shards))
        return n // self.batch_size if self.drop_last \
            else -(-n // self.batch_size)


class DataLoader:
    """Iterates collated batches, optionally prefetching on a thread."""

    def __init__(self, dataset, collater: Callable, batch_size: int,
                 shuffle: bool = True, seed: int = 0,
                 prefetch: int = 2, drop_last: bool = True,
                 device_put: Optional[Callable] = None,
                 shard_index: int = 0, num_shards: int = 1,
                 workers: int = 1):
        self.dataset = dataset
        self.collater = collater
        self.sampler = BatchSampler(dataset, batch_size, shuffle,
                                    seed=seed, drop_last=drop_last,
                                    shard_index=shard_index,
                                    num_shards=num_shards)
        self.prefetch = prefetch
        self.device_put = device_put
        # Parallel producer threads (reference: DataLoader worker
        # processes, ``Train.py:100-123``).  Threads, not processes: the
        # work is pickle IO + numpy padding, which releases the GIL, and
        # the batches land in the same process for device_put.
        self.workers = max(int(workers), 1)

    def __len__(self) -> int:
        return len(self.sampler)

    def _make_batch(self, indices):
        batch = self.collater([self.dataset[int(i)] for i in indices])
        if self.device_put is not None:
            batch = self.device_put(batch)
        return batch

    def _produce(self, q: queue.Queue, iterator, lock, counter):
        try:
            while True:
                with lock:
                    indices = next(iterator, None)
                    order = counter[0]
                    counter[0] += 1
                if indices is None:
                    break
                # tag with the sampler position: the consumer re-emits in
                # sampler order, so multi-worker batch order is
                # deterministic (torch's DataLoader guarantee,
                # ``Train.py:100-123`` — and what makes resumed runs
                # consume the identical batch sequence)
                q.put((order, self._make_batch(indices)))
        except Exception as error:            # surface in the consumer
            q.put(error)
        finally:
            q.put(None)                        # one sentinel per worker

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        if self.prefetch <= 0:
            for indices in self.sampler:
                yield self._make_batch(indices)
            return
        q: queue.Queue = queue.Queue(maxsize=max(self.prefetch,
                                                 self.workers))
        iterator = iter(self.sampler)
        lock = threading.Lock()
        counter = [0]
        threads = [threading.Thread(target=self._produce,
                                    args=(q, iterator, lock, counter),
                                    daemon=True)
                   for _ in range(self.workers)]
        for t in threads:
            t.start()
        finished = 0
        pending: Dict[int, Any] = {}
        next_order = 0
        while finished < len(threads):
            item = q.get()
            if item is None:
                finished += 1
                continue
            if isinstance(item, Exception):
                raise item
            order, batch = item
            pending[order] = batch
            while next_order in pending:
                yield pending.pop(next_order)
                next_order += 1
        for t in threads:
            t.join()
        # drain anything that raced the sentinels
        while next_order in pending:
            yield pending.pop(next_order)
            next_order += 1
