"""Threaded prefetching data loader (host pipeline).

Replaces torch DataLoader workers (reference: base_trainer.py:20-25,
trainer_SID.py:49): worker threads run dataset __getitem__ (NumPy, GIL
released in BLAS/IO), a bounded queue smooths latency, and batches are
stacked contiguous so device_put is a single transfer. Seed discipline
mirrors the reference's worker_init_fn: each epoch reseeds deterministically
from (base_seed, epoch).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator

import numpy as np


def collate(samples: list) -> dict:
    """Stack example dicts; image crops concatenate along the crop axis
    (the reference's dim5->4 view, trainer_SID.py:423)."""
    out = {}
    first = samples[0]
    for k, v in first.items():
        vals = [s[k] for s in samples]
        if isinstance(v, np.ndarray) and v.ndim >= 3:  # [n, p, p, c] crops
            out[k] = np.concatenate(vals, axis=0)
        elif isinstance(v, np.ndarray):
            out[k] = np.concatenate([np.atleast_1d(x) for x in vals], axis=0)
        elif isinstance(v, (int, float, np.number, bool)):
            out[k] = np.asarray(vals)
        else:
            out[k] = vals  # strings etc.
    return out


class DataLoader:
    """Iterable over shuffled batches with background prefetch."""

    def __init__(self, dataset, batch_size: int = 1, shuffle: bool = True,
                 num_workers: int = 2, prefetch: int = 4, seed: int = 1997,
                 drop_last: bool = False):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(0, num_workers)
        self.prefetch = prefetch
        self.seed = seed
        self.drop_last = drop_last
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def _index_batches(self):
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            np.random.default_rng(self.seed + self.epoch).shuffle(idx)
        bs = self.batch_size
        stop = (n // bs) * bs if self.drop_last else n
        return [idx[i : i + bs] for i in range(0, stop, bs) if len(idx[i : i + bs])]

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self) -> Iterator[dict]:
        batches = self._index_batches()
        if self.num_workers == 0:
            for b in batches:
                yield collate([self.dataset[int(i)] for i in b])
            return

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        task_q: queue.Queue = queue.Queue()
        results: dict = {}
        lock = threading.Lock()
        stop = threading.Event()

        for bi, b in enumerate(batches):
            task_q.put((bi, b))

        def worker():
            while not stop.is_set():
                try:
                    bi, b = task_q.get_nowait()
                except queue.Empty:
                    return
                try:
                    batch = collate([self.dataset[int(i)] for i in b])
                except Exception as e:  # surface in consumer
                    batch = e
                with lock:
                    results[bi] = batch

        threads = [threading.Thread(target=worker, daemon=True) for _ in range(self.num_workers)]
        for t in threads:
            t.start()
        try:
            for bi in range(len(batches)):
                while True:
                    with lock:
                        if bi in results:
                            batch = results.pop(bi)
                            break
                    threading.Event().wait(0.002)
                if isinstance(batch, Exception):
                    raise batch
                yield batch
        finally:
            stop.set()
