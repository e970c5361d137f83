"""Epoch driver: the reference's train loop shape, timers and log line.

Reference loop (train.lua:275-304): per step adam(fDx) then adam(fGx), a log
line `Epoch: [e][i / N] Time DataTime Err_G Err_D`, and an epoch-time line.
Per-epoch checkpoints were present-but-commented in the reference
(train.lua:297-299); here they are on by default.  Timers mirror the tm /
data_tm / epoch_tm triple (train.lua:159-161).
"""

from __future__ import annotations

import jax
import numpy as np

from ..utils.logging import MetricsLogger
from ..utils.timers import Timer
from .step import TrainState, build_train_step


def train_epochs(cfg, state: TrainState, batch_fn, *, step_fn=None, niter=None,
                 steps_per_epoch=None, log_fn=None, checkpoint_dir=None,
                 prepare_batch=None, logger: MetricsLogger = None, log_every=1):
    """Run the training loop.

    batch_fn(epoch, step_index) -> (B, C, H, W) HR batch (numpy or jax array)
    step_fn: jitted train step (defaults to single-device jit of cfg's step)
    prepare_batch: optional device placement hook (e.g. parallel.shard_batch)
    logger: optional MetricsLogger (default: stdout-only, reference format)
    log_every: fetch/print metrics every N steps.  1 = per-step logging like
    the reference (train.lua:286-293) — note each fetch synchronizes the
    device; larger values let dispatch run ahead and overlap the host-side
    batch_fn with device compute.
    """
    if step_fn is None:
        step_fn = jax.jit(build_train_step(cfg), donate_argnums=(0,))
    niter = niter if niter is not None else cfg.niter
    if steps_per_epoch is None:
        ntrain = cfg.ntrain if np.isfinite(cfg.ntrain) else cfg.batchSize
        steps_per_epoch = max(int(ntrain) // cfg.batchSize, 1)
    own_logger = logger is None
    if own_logger:
        logger = MetricsLogger(log_fn=log_fn)

    tm, data_tm, epoch_tm = Timer(), Timer(), Timer()
    metrics_last = None
    try:
        for epoch in range(1, niter + 1):
            epoch_tm.reset()
            for i in range(steps_per_epoch):
                tm.reset()
                data_tm.reset()
                hr = batch_fn(epoch, i)
                if prepare_batch is not None:
                    hr = prepare_batch(hr)
                data_tm.stop()

                state, metrics = step_fn(state, hr)
                metrics_last = metrics
                if (i + 1) % log_every == 0 or i == steps_per_epoch - 1:
                    metrics_host = {k: float(v) for k, v in metrics.items()}
                    logger.log_step(epoch, i, steps_per_epoch,
                                    tm.time()["real"], data_tm.time()["real"],
                                    metrics_host)
            logger.log_epoch(epoch, niter, epoch_tm.time()["real"])
            if checkpoint_dir is not None:
                from .checkpoint import save_checkpoint
                save_checkpoint(checkpoint_dir, cfg.name, epoch, state)
    finally:
        if own_logger:
            logger.close()
    return state, metrics_last
