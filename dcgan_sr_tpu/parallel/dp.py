"""Data-parallel train step: shard_map over the batch axis with psum'd grads.

The batch (large in every variant: 100 images or 1,280 patches) shards over
the `data` mesh axis; params/optimizer state replicate; gradients and losses
pmean over ICI inside the step; BN runs cross-replica so the math matches the
reference's full-batch statistics exactly (SURVEY.md §2.5 'DP over ICI').
"""

from __future__ import annotations

import jax
from jax import shard_map
from jax.sharding import PartitionSpec as P

from ..train.step import build_train_step


def shard_batch(batch, mesh, axis_name="data", batch_dim=0):
    """Place a host batch sharded over the mesh's data axis.

    batch_dim selects which dimension shards (1 for a (K, B, ...) scan
    super-batch whose leading dim is the step axis)."""
    spec = P(*([None] * batch_dim + [axis_name]))
    sharding = jax.sharding.NamedSharding(mesh, spec)
    return jax.device_put(batch, sharding)


def build_dp_train_step(cfg, mesh, *, jit=True):
    """Returns train_step(state, hr_batch) running data-parallel over `mesh`.

    hr_batch's leading dim must be divisible by the mesh size; params and
    optimizer state are replicated, gradients pmean over the axis before the
    (replicated) Adam update — the ICI allreduce the reference never had.
    """
    axis = cfg.data_axis
    step = build_train_step(cfg, axis_name=axis)
    mapped = shard_map(
        step, mesh=mesh,
        in_specs=(P(), P(axis)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    if jit:
        mapped = jax.jit(mapped, donate_argnums=(0,))
    return mapped


def build_dp_multi_step(cfg, mesh, *, jit=True):
    """K scanned DP steps in ONE program: shard_map over the per-shard scan.

    hr_batches: (K, B, ...) with B sharded over the data axis (use
    shard_batch(..., batch_dim=1)). The scan body is the same cross-replica
    step as build_dp_train_step, so DP == single-device math holds stepwise.
    """
    from ..train.multi_step import build_multi_step

    axis = cfg.data_axis
    mstep = build_multi_step(cfg, axis_name=axis)
    mapped = shard_map(
        mstep, mesh=mesh,
        in_specs=(P(), P(None, axis)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    if jit:
        mapped = jax.jit(mapped, donate_argnums=(0,))
    return mapped
