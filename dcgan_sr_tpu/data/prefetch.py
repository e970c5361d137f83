"""Async batch prefetcher — the donkey thread pool, natively.

Reference (data/data.lua): N threads each seeded manualSeed+idx (:35-36),
n jobs pre-enqueued (:59-62), getBatch() enqueues one job and dequeues one
result (:82-93).  N=0 degrades to a synchronous single-thread mode (:45-51) —
kept here as the deterministic seam for tests.

Here: a bounded queue fed by worker threads; each worker owns an
np.random.RandomState(manual_seed + idx).  get_batch() blocks on the queue,
keeping at most `n_threads` batches in flight like the reference's
one-job-in/one-out discipline.
"""

from __future__ import annotations

import queue
import threading

import numpy as np


class PrefetchLoader:
    def __init__(self, sample_fn, n_threads=4, manual_seed=0, queue_size=None):
        """sample_fn(rng) -> one batch (numpy array)."""
        self.sample_fn = sample_fn
        self.n_threads = n_threads
        self.manual_seed = manual_seed
        self._sync_rng = np.random.RandomState(manual_seed)
        if n_threads > 0:
            self._q = queue.Queue(maxsize=queue_size or n_threads)
            self._stop = threading.Event()
            self._threads = []
            for idx in range(1, n_threads + 1):
                t = threading.Thread(target=self._worker,
                                     args=(idx,), daemon=True)
                t.start()
                self._threads.append(t)

    def _worker(self, idx):
        rng = np.random.RandomState(self.manual_seed + idx)  # data.lua:35-36
        while not self._stop.is_set():
            batch = self.sample_fn(rng)
            while not self._stop.is_set():
                try:
                    self._q.put(batch, timeout=0.1)
                    break
                except queue.Full:
                    continue

    def get_batch(self):
        if self.n_threads == 0:
            return self.sample_fn(self._sync_rng)  # synchronous fallback
        return self._q.get()

    def close(self):
        if self.n_threads > 0:
            self._stop.set()
            for t in self._threads:
                t.join(timeout=1.0)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
