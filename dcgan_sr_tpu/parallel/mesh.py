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
