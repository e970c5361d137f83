"""Async batch prefetcher — the donkey thread pool, natively.

Reference (data/data.lua): N threads each seeded manualSeed+idx (:35-36),
n jobs pre-enqueued (:59-62), getBatch() enqueues one job and dequeues one
result (:82-93) — exactly n batches in flight at all times.  N=0 degrades to
a synchronous single-thread mode (:45-51), kept here as the deterministic
seam for tests.

Two threaded disciplines:

  strict=True (default) — the reference discipline: n jobs pre-enqueued, one
    job enqueued per get_batch(), results consumed in job order.  Jobs are
    dispatched round-robin to workers (a deterministic refinement of the
    reference's whichever-donkey-is-free scheduling), so a seeded run yields
    a reproducible batch sequence even with n_threads > 1.

  strict=False — free-running workers into a bounded queue (at most
    queue_size batches buffered).  Higher throughput when decode is the
    bottleneck, but the batch sequence depends on thread timing.
"""

from __future__ import annotations

import collections
import queue
import threading

import numpy as np


class PrefetchLoader:
    def __init__(self, sample_fn, n_threads=4, manual_seed=0, queue_size=None,
                 strict=True):
        """sample_fn(rng) -> one batch (numpy array)."""
        self.sample_fn = sample_fn
        self.n_threads = n_threads
        self.manual_seed = manual_seed
        self.strict = strict
        self._sync_rng = np.random.RandomState(manual_seed)
        if n_threads <= 0:
            return
        self._stop = threading.Event()
        self._threads = []
        if strict:
            self._inboxes = [queue.Queue() for _ in range(n_threads)]
            self._pending = collections.deque()
            self._next_worker = 0
            for idx in range(1, n_threads + 1):
                t = threading.Thread(target=self._worker_strict,
                                     args=(idx,), daemon=True)
                t.start()
                self._threads.append(t)
            for _ in range(n_threads):  # pre-enqueue n jobs (data.lua:59-62)
                self._enqueue_job()
        else:
            self._q = queue.Queue(maxsize=queue_size or n_threads)
            for idx in range(1, n_threads + 1):
                t = threading.Thread(target=self._worker_free,
                                     args=(idx,), daemon=True)
                t.start()
                self._threads.append(t)

    # ---- strict (reference) discipline -------------------------------------
    def _enqueue_job(self):
        slot = queue.Queue()  # unbounded: a result is never blocked on put
        self._inboxes[self._next_worker].put(slot)
        self._next_worker = (self._next_worker + 1) % self.n_threads
        self._pending.append(slot)

    def _worker_strict(self, idx):
        rng = np.random.RandomState(self.manual_seed + idx)  # data.lua:35-36
        inbox = self._inboxes[idx - 1]
        while True:
            slot = inbox.get()
            if slot is None:  # close sentinel
                return
            slot.put(self.sample_fn(rng))

    # ---- free-running discipline --------------------------------------------
    def _worker_free(self, idx):
        rng = np.random.RandomState(self.manual_seed + idx)
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
        if self.strict:
            self._enqueue_job()  # one in (data.lua:84)...
            return self._pending.popleft().get()  # ...one out, job order
        return self._q.get()

    def close(self):
        if self.n_threads <= 0:
            return
        self._stop.set()
        if self.strict:
            for inbox in self._inboxes:
                inbox.put(None)
        for t in self._threads:
            t.join(timeout=5.0)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
