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
back; rot90/flip lower to cheap layout ops. Under train-mode BatchNorm each
member normalizes with its own batch's statistics — the exact rule the
reference's batch-stats inference applies to any forward (tiled.py) — and
the INPUT's per-channel moments are transform-invariant, so the wrapper
composes with both BN inference modes.
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


def self_ensemble(gen_fn, transforms=8, batched=False):
    """Wrap gen_fn(params, state, x) -> y with dihedral averaging.

    x, y: (..., H, W) with the spatial dims trailing (NCHW). transforms:
    1 = plain forward, 2 = + hflip, 4 = + rot180 pair (rectangle-safe),
    8 = full D4 (square inputs; rectangles fall back to 4). The group is
    resolved from x's static shape at trace time, so the wrapped function
    jits to a single fused program.

    `batched=True` concatenates the N transformed copies on the leading
    (batch) axis and runs gen_fn ONCE on the (N*B, ...) batch — one conv
    dispatch instead of N, the MXU-friendly form for small per-member
    batches (x batched as (B, C, H, W)). With running-stats or no BN this
    is exact (same math, one dispatch). With TRAIN-mode BN it is a close
    variant, not identical: the INPUT's moments are transform-invariant,
    but deeper activations are conv(rot(x)) != rot(conv(x)), so member
    batch moments diverge slightly and the joint batch pools them
    (measured <= 4e-4 output delta on a random-init gray-3 at N=8).
    """
    if transforms == 1:
        return gen_fn

    def members_of(x, plan):
        out = []
        for k, f in plan:
            xi = jnp.rot90(x, k, axes=(-2, -1))
            out.append(jnp.flip(xi, axis=-1) if f else xi)
        return out

    def invert(ys, plan):
        out = []
        for (k, f), y in zip(plan, ys):
            if f:
                y = jnp.flip(y, axis=-1)
            out.append(jnp.rot90(y, -k, axes=(-2, -1)))
        return out

    def wrapped(params, state, x):
        plan = dihedral_plan(x.shape[-2], x.shape[-1], transforms)
        ys = [gen_fn(params, state, xi) for xi in members_of(x, plan)]
        ys = invert(ys, plan)
        return sum(ys) / len(ys)

    def wrapped_batched(params, state, x):
        # dihedral_plan only returns shape-preserving members (rectangles
        # get the flip subgroup), so the concat below is always legal
        plan = dihedral_plan(x.shape[-2], x.shape[-1], transforms)
        b = x.shape[0]
        big = jnp.concatenate(members_of(x, plan), axis=0)   # (N*B, ...)
        y = gen_fn(params, state, big)
        ys = invert([y[i * b:(i + 1) * b] for i in range(len(plan))], plan)
        return sum(ys) / len(ys)

    return wrapped_batched if batched else wrapped
