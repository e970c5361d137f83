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


def test_strict_two_thread_reproducible():
    """Reference discipline (data.lua:59-62,82-93): n jobs in flight, one
    enqueued per get, results in job order.  With round-robin dispatch a
    seeded two-thread run must reproduce exactly."""
    def sample(rng):
        return np.array([rng.randint(0, 1 << 30)])

    def run():
        with PrefetchLoader(sample, n_threads=2, manual_seed=11,
                            strict=True) as loader:
            return [int(loader.get_batch()[0]) for _ in range(20)]

    a, b = run(), run()
    assert a == b
    # job i goes to worker (i % 2), workers seeded manual_seed+1/+2:
    # result sequence must interleave the two per-worker streams
    s1 = np.random.RandomState(12)
    s2 = np.random.RandomState(13)
    expect = []
    for i in range(20):
        expect.append(int((s1 if i % 2 == 0 else s2).randint(0, 1 << 30)))
    assert a == expect


def test_strict_bounded_in_flight():
    """At most n_threads jobs are ever admitted beyond those consumed."""
    import threading as th
    counter = {"n": 0}
    lock = th.Lock()

    def sample(rng):
        with lock:
            counter["n"] += 1
        return rng.rand(1)

    with PrefetchLoader(sample, n_threads=3, manual_seed=5,
                        strict=True) as loader:
        for _ in range(30):
            loader.get_batch()
        time.sleep(0.1)  # let in-flight prefetch jobs drain
        assert counter["n"] <= 30 + 3  # 30 consumed + n prefetched, never more


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
