"""Per-host sharded feed (parallel.mesh.local_batch_slice): simulated
multi-host slicing semantics — each host materializes a disjoint slice of the
global batch and the slices tile it exactly (SURVEY.md §2.5 host->device
feed row)."""

import numpy as np

from dcgan_sr_tpu.parallel.mesh import local_batch_slice


def test_slices_partition_batch():
    global_batch = 96
    n_hosts = 4
    got = []
    for i in range(n_hosts):
        s = local_batch_slice(global_batch, process_count=n_hosts,
                              process_index=i)
        assert s.stop - s.start == global_batch // n_hosts
        got.extend(range(s.start, s.stop))
    assert got == list(range(global_batch))


def test_sliced_feed_reconstructs_global():
    rng = np.random.RandomState(0)
    batch = rng.rand(32, 1, 8, 8).astype(np.float32)
    shards = [batch[local_batch_slice(32, process_count=2, process_index=i)]
              for i in range(2)]
    np.testing.assert_array_equal(np.concatenate(shards), batch)


def test_single_host_is_identity():
    batch = np.arange(10)
    s = local_batch_slice(10, process_count=1, process_index=0)
    np.testing.assert_array_equal(batch[s], batch)
