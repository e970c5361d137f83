"""Epoch driver: the reference's train loop shape, timers and log line.

Reference loop (train.lua:275-304): per step adam(fDx) then adam(fGx), a log
line `Epoch: [e][i / N] Time DataTime Err_G Err_D`, and an epoch-time line.
Per-epoch checkpoints were present-but-commented in the reference
(train.lua:297-299); here they are on by default.
"""

from __future__ import annotations

import time

import jax
import numpy as np

from .step import TrainState, build_train_step


def train_epochs(cfg, state: TrainState, batch_fn, *, step_fn=None, niter=None,
                 steps_per_epoch=None, log_fn=print, checkpoint_dir=None,
                 prepare_batch=None):
    """Run the training loop.

    batch_fn(epoch, step_index) -> (B, C, H, W) HR batch (numpy or jax array)
    step_fn: jitted train step (defaults to single-device jit of cfg's step)
    prepare_batch: optional device placement hook (e.g. parallel.shard_batch)
    """
    if step_fn is None:
        step_fn = jax.jit(build_train_step(cfg), donate_argnums=(0,))
    niter = niter if niter is not None else cfg.niter
    if steps_per_epoch is None:
        ntrain = cfg.ntrain if np.isfinite(cfg.ntrain) else cfg.batchSize
        steps_per_epoch = max(int(ntrain) // cfg.batchSize, 1)

    metrics_last = None
    for epoch in range(1, niter + 1):
        epoch_t0 = time.perf_counter()
        for i in range(steps_per_epoch):
            step_t0 = time.perf_counter()
            data_t0 = time.perf_counter()
            hr = batch_fn(epoch, i)
            if prepare_batch is not None:
                hr = prepare_batch(hr)
            data_time = time.perf_counter() - data_t0

            state, metrics = step_fn(state, hr)
            metrics_last = metrics
            err_g = float(metrics["errG"])
            err_d = float(metrics["errD"])
            step_time = time.perf_counter() - step_t0
            # log-line parity with train.lua:287-292
            log_fn("Epoch: [%d][%8d / %8d]\t Time: %.3f  DataTime: %.3f  "
                   "  Err_G: %.16f  Err_D: %.4f"
                   % (epoch, i, steps_per_epoch, step_time, data_time,
                      err_g, err_d))
        log_fn("End of epoch %d / %d \t Time Taken: %.3f"
               % (epoch, niter, time.perf_counter() - epoch_t0))
        if checkpoint_dir is not None:
            from .checkpoint import save_checkpoint
            save_checkpoint(checkpoint_dir, cfg.name, epoch, state)
    return state, metrics_last
