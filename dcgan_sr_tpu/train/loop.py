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
                 prepare_batch=None, logger: MetricsLogger = None, log_every=1,
                 scan_steps=1, multi_step_fn=None, start_epoch=0,
                 stage_ahead=False):
    """Run the training loop.

    batch_fn(epoch, step_index) -> (B, C, H, W) HR batch (numpy or jax array)
    step_fn: jitted train step (defaults to single-device jit of cfg's step)
    prepare_batch: optional device placement hook (e.g. parallel.shard_batch);
    receives either a (B, ...) batch or, when scanning, a (K, B, ...)
    super-batch
    logger: optional MetricsLogger (default: stdout-only, reference format)
    log_every: fetch/print metrics every N steps.  1 = per-step logging like
    the reference (train.lua:286-293) — note each fetch synchronizes the
    device; larger values let dispatch run ahead and overlap the host-side
    batch_fn with device compute.
    scan_steps: K>1 runs full K-step chunks through ONE lax.scan program
    (multi_step_fn, default train.multi_step.jit_multi_step) — one dispatch
    per K steps; the epoch's remainder steps run through step_fn. Epoch math
    is unchanged (scan body == the single-step program; tested equivalent).
    start_epoch: resume offset — epochs run start_epoch+1 .. niter and
    checkpoints keep their continued numbering instead of restarting at 1
    (the reference has no resume; this is the rebuild's resume contract).
    stage_ahead: double-buffer the feed — build and `jax.device_put` chunk
    c+1 WHILE the device computes chunk c (JAX dispatch is async; the
    per-chunk metrics fetch is what synchronizes). Hides host batch work
    and the host->device transfer behind compute; epoch math is unchanged
    (same batches in the same order; tested identical). Log semantics
    shift slightly: DataTime is the overlapped build+put cost of the
    chunk (measured when it actually ran), Time is the chunk's wall
    (dispatch -> staging -> fetch).
    """
    if step_fn is None:
        step_fn = jax.jit(build_train_step(cfg), donate_argnums=(0,))
    if scan_steps > 1 and multi_step_fn is None:
        from .multi_step import jit_multi_step
        multi_step_fn = jit_multi_step(cfg)
    niter = niter if niter is not None else cfg.niter
    if steps_per_epoch is None:
        # ntrain counts IMAGES (config.images_consumed_per_step; cli.py uses
        # the same property with its own synthetic-length inf fallback)
        imgs = cfg.images_consumed_per_step
        ntrain = cfg.ntrain if np.isfinite(cfg.ntrain) else imgs
        steps_per_epoch = max(int(ntrain) // imgs, 1)
    own_logger = logger is None
    if own_logger:
        logger = MetricsLogger(log_fn=log_fn)

    tm, data_tm, epoch_tm = Timer(), Timer(), Timer()
    metrics_last = None

    def chunk_size(i):
        return scan_steps if (scan_steps > 1
                              and steps_per_epoch - i >= scan_steps) else 1

    def build_chunk(epoch, i, k):
        """Host batch build + device placement; returns (batch, seconds)."""
        data_tm.reset()
        if k > 1:
            # pytree-aware stack: device_augment batches are
            # (canvas, tops, lefts, flips) tuples
            chunk = [batch_fn(epoch, i + j) for j in range(k)]
            hr = jax.tree_util.tree_map(
                lambda *xs: np.stack([np.asarray(x) for x in xs]),
                *chunk)
        else:
            hr = batch_fn(epoch, i)
        if prepare_batch is not None:
            hr = prepare_batch(hr)
        elif stage_ahead:
            # async: returns immediately with the transfer in flight, so
            # it rides under the PREVIOUS chunk's device compute
            hr = jax.device_put(hr)
        data_tm.stop()
        return hr, data_tm.time()["real"]

    try:
        for epoch in range(start_epoch + 1, niter + 1):
            epoch_tm.reset()
            i = 0
            staged = None
            while i < steps_per_epoch:
                k = chunk_size(i)
                tm.reset()
                if staged is None:
                    hr, data_s = build_chunk(epoch, i, k)
                else:
                    hr, data_s = staged

                if k > 1:
                    state, stacked = multi_step_fn(state, hr)
                    metrics = {key: v[-1] for key, v in stacked.items()}
                else:
                    state, metrics = step_fn(state, hr)
                metrics_last = metrics
                done = i + k
                if stage_ahead and done < steps_per_epoch:
                    # device is computing this chunk right now (dispatch is
                    # async; nothing has synchronized yet): overlap the next
                    # chunk's host build + transfer with it
                    staged = build_chunk(epoch, done, chunk_size(done))
                else:
                    staged = None
                if (done % log_every < k) or done == steps_per_epoch:
                    metrics_host = {key: float(v) for key, v in metrics.items()}
                    logger.log_step(epoch, done - 1, steps_per_epoch,
                                    tm.time()["real"], data_s,
                                    metrics_host)
                i = done
            logger.log_epoch(epoch, niter, epoch_tm.time()["real"])
            if checkpoint_dir is not None:
                from .checkpoint import save_checkpoint
                save_checkpoint(checkpoint_dir, cfg.name, epoch, state)
    finally:
        if own_logger:
            logger.close()
    return state, metrics_last
