"""Threaded prefetching batch loader feeding HBM-resident batches.

Replaces torch DataLoader(num_workers=16, pin_memory=True)
(ref: AVMOE/AVE/main_trans_v3.py:256-262) with a thread-pool prefetcher:
decode/stack on host threads, then `jax.device_put` against the mesh batch
sharding so the step function never blocks on H2D."""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable, Dict, Iterator, Optional

import numpy as np


class BatchLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        *,
        shuffle: bool = False,
        drop_last: bool = True,
        num_workers: int = 4,
        prefetch: int = 2,
        seed: int = 0,
        device_put: Optional[Callable[[Dict[str, np.ndarray]], Any]] = None,
        process_index: int = 0,
        process_count: int = 1,
    ):
        """batch_size is the GLOBAL batch. With process_count > 1 (multi-host
        training), every host builds the same seeded global permutation but
        collates only its contiguous 1/process_count slice of each batch;
        pair with `parallel.mesh.shard_batch_per_host` to assemble the global
        jax.Array from the per-host shards."""
        assert batch_size % process_count == 0, (batch_size, process_count)
        # A partial final batch cannot be sliced per-host (the slice for high
        # process_index is short/empty and shard_batch_per_host's global
        # shape would be wrong); multi-host loading requires drop_last.
        assert process_count == 1 or drop_last, (
            "drop_last=False is unsupported with process_count > 1: the final "
            "partial batch cannot be evenly sliced across hosts")
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.seed = seed
        self.device_put = device_put
        self.process_index = process_index
        self.process_count = process_count
        self._epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _index_batches(self):
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.RandomState(self.seed + self._epoch).shuffle(idx)
        nb = len(self)
        batches = [idx[i * self.batch_size: (i + 1) * self.batch_size]
                   for i in range(nb)]
        if self.process_count > 1:
            local = self.batch_size // self.process_count
            lo = self.process_index * local
            batches = [b[lo: lo + local] for b in batches]
        return batches

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        self._epoch += 1
        batches = self._index_batches()
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def collate(indices):
            items = [self.dataset[int(i)] for i in indices]
            batch = {k: np.stack([it[k] for it in items]) for k in items[0]}
            return self.device_put(batch) if self.device_put else batch

        def producer():
            with ThreadPoolExecutor(self.num_workers) as pool:
                futures = [pool.submit(collate, b) for b in batches]
                for fut in futures:
                    if stop.is_set():
                        fut.cancel()
                        continue
                    try:
                        q.put(fut.result())
                    except Exception as e:  # surface worker errors to consumer
                        q.put(e)
                        return
            q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()
