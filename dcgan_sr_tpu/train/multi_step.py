"""Multi-step training: K train steps fused into ONE XLA program via lax.scan.

The reference pays a Lua->C dispatch per module per step; even our fused
single-step pays one host->device dispatch per step (expensive over a tunnel,
non-trivial on a local chip).  Scanning K steps over a pre-staged (K, B, C, H,
W) super-batch amortizes dispatch to 1/K and lets XLA overlap the data
movement of step k+1 with the compute of step k — no reference equivalent,
pure TPU-first win.

Epoch semantics are unchanged: the scanned body is exactly
train.step.build_train_step's program, state threads through the scan carry.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from .step import build_train_step


def build_multi_step(cfg, *, axis_name=None, unroll=1):
    """Returns multi_step(state, hr_batches) -> (state, stacked_metrics).

    hr_batches: (K, B, C, H, W) — K consecutive batches.
    stacked_metrics: dict of (K,) arrays (per-step losses, reference log-line
    fields preserved).
    """
    step = build_train_step(cfg, axis_name=axis_name)

    def multi_step(state, hr_batches):
        def body(carry, hr):
            new_state, metrics = step(carry, hr)
            return new_state, metrics

        return lax.scan(body, state, hr_batches, unroll=unroll)

    return multi_step


def jit_multi_step(cfg, **jit_kw):
    return jax.jit(build_multi_step(cfg), donate_argnums=(0,), **jit_kw)
