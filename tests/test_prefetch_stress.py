"""Prefetcher concurrency stress: no deadlock, no lost batches, clean close.

The reference's only shared state is a 1-slot result mailbox guarded by the
threads lib (data/data.lua:72-78; SURVEY.md §5 race-detection row).  Our
bounded queue gets an actual stress test."""

import threading
import time

import numpy as np

from dcgan_sr_tpu.data import PrefetchLoader


def test_many_threads_many_batches():
    counter = {"n": 0}
    lock = threading.Lock()

    def sample(rng):
        with lock:
            counter["n"] += 1
        return rng.rand(4)

    with PrefetchLoader(sample, n_threads=8, manual_seed=3) as loader:
        batches = [loader.get_batch() for _ in range(200)]
    assert len(batches) == 200
    assert all(b.shape == (4,) for b in batches)
    assert counter["n"] >= 200  # workers may have produced a few extra


def test_slow_consumer_does_not_deadlock():
    def sample(rng):
        return rng.rand(2)

    with PrefetchLoader(sample, n_threads=4, manual_seed=1, queue_size=2) as l:
        for _ in range(10):
            time.sleep(0.01)  # consumer slower than producers
            l.get_batch()


def test_close_joins_workers():
    def sample(rng):
        time.sleep(0.005)
        return rng.rand(1)

    loader = PrefetchLoader(sample, n_threads=4, manual_seed=2)
    loader.get_batch()
    loader.close()
    assert all(not t.is_alive() for t in loader._threads)


def test_per_worker_seed_streams_disjoint():
    """Workers are seeded manualSeed+idx (data.lua:35-36): their first draws
    must all differ."""
    seen = []
    lock = threading.Lock()

    def sample(rng):
        v = float(rng.rand())
        with lock:
            seen.append(v)
        return np.array([v])

    with PrefetchLoader(sample, n_threads=6, manual_seed=100) as loader:
        for _ in range(12):
            loader.get_batch()
    firsts = {round(np.random.RandomState(100 + i).rand(), 12)
              for i in range(1, 7)}
    assert firsts & {round(v, 12) for v in seen}  # worker streams observed
    assert len(firsts) == 6  # all distinct
