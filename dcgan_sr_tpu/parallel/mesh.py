"""Device mesh construction — the TPU replacement for `cutorch.setDevice(1)`.

The reference is single-GPU (train.lua:169); the rebuild's required parallelism
story is data parallelism over ICI (SURVEY.md §2.5): a 1-D mesh over all local
chips with the batch sharded on axis `data` and gradients psum-reduced.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def device_count() -> int:
    return jax.device_count()


def create_mesh(n_devices=None, axis_name="data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        if n_devices > len(devs):
            raise ValueError(
                f"requested {n_devices} devices, have {len(devs)} "
                "(use XLA_FLAGS=--xla_force_host_platform_device_count=N on CPU)")
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis_name,))


def initialize_distributed(coordinator_address=None, num_processes=None,
                           process_id=None):
    """Multi-host (pod) initialization: call once per host before create_mesh.

    After this, jax.devices() spans all hosts; the DP mesh's gradient pmean
    rides ICI within a slice and DCN across slices automatically — the data
    loaders should then feed per-host shards (each host sees
    jax.local_device_count() of the global batch).  No-op on a single host.
    """
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def local_batch_slice(global_batch: int, process_count=None,
                      process_index=None) -> slice:
    """The per-host slice of a globally-sharded batch.

    Each host's loader materializes only its slice of the global batch
    (train.lua:168-169 has one GPU and no notion of this; the pod-scale
    rebuild feeds per-host shards).  `process_count`/`process_index` default
    to the live jax values; pass them explicitly to simulate hosts in tests.
    """
    n = jax.process_count() if process_count is None else process_count
    i = jax.process_index() if process_index is None else process_index
    per = global_batch // n
    start = i * per
    return slice(start, start + per)
