"""Threaded prefetching data loader.

Replaces torch DataLoader workers (data_modules.py:135-156): a thread pool
loads/augments items (IO-bound host work), batches are collated and
featurized on device, and a small prefetch queue keeps the accelerator fed.
Broken items collapse to None and are dropped, matching the reference's
collate behavior (data.py:624).
"""
from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterable, Optional

from radmmm_tpu.data.collate import BucketBatcher, collate_host


class DataLoader:
    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 featurizer: Optional[Callable] = None,
                 num_threads: int = 4, prefetch: int = 2, seed: int = 0,
                 hop_length: int = 256, drop_last: bool = False,
                 process_index: Optional[int] = None,
                 process_count: Optional[int] = None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.featurizer = featurizer
        self.num_threads = num_threads
        self.prefetch = prefetch
        self.hop_length = hop_length
        self.drop_last = drop_last
        # multi-host DP (jax.distributed): each process takes a strided
        # subset of batches, truncated so every host runs the same number of
        # steps per epoch (no straggler deadlock at the collectives)
        if process_count is None:
            import jax
            process_count = jax.process_count()
            process_index = jax.process_index()
        self.process_index = process_index or 0
        self.process_count = max(1, process_count)
        lengths = [u.duration for u in dataset.data]
        self.batcher = BucketBatcher(lengths, batch_size, shuffle, seed)

    def __len__(self):
        return len(self.batcher) // self.process_count

    def _my_batches(self):
        n_use = (len(self.batcher) // self.process_count) \
            * self.process_count
        for i, indices in enumerate(self.batcher):
            if i >= n_use:
                break
            if i % self.process_count == self.process_index:
                yield indices

    def _load_batch(self, pool, indices):
        items = list(pool.map(self.dataset.__getitem__, indices))
        host = collate_host(items, hop_length=self.hop_length)
        if host is None:
            return None
        if self.drop_last and len(host["idx"]) < self.batch_size:
            return None
        return self.featurizer(host) if self.featurizer else host

    def __iter__(self) -> Iterable:
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        sentinel = object()

        def producer():
            try:
                with ThreadPoolExecutor(self.num_threads) as pool:
                    for indices in self._my_batches():
                        q.put(self._load_batch(pool, indices))
            except BaseException as e:  # propagate into the consumer
                q.put(e)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            batch = q.get()
            if batch is sentinel:
                break
            if isinstance(batch, BaseException):
                raise batch
            if batch is not None:
                yield batch
        t.join()
