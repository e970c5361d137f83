"""Adam with exact torch/optim semantics, over parameter pytrees.

The reference drives both networks with `optim.adam(closure, params, state)` on
one flattened parameter vector (train.lua:280-283, getParameters at :202-203).
torch/optim/adam.lua computes

    m <- b1*m + (1-b1)*g
    v <- b2*v + (1-b2)*g^2
    x <- x - lr*sqrt(1-b2^t)/(1-b1^t) * m / (sqrt(v) + eps)

Note the epsilon sits OUTSIDE the bias correction of sqrt(v) — this differs
(negligibly, but we match bit-for-bit) from optax/pytorch Adam, which use
m_hat / (sqrt(v_hat) + eps).  Defaults: lr 2e-4, beta1 0.5 (train.lua:18-19),
beta2 0.999, eps 1e-8.

Flattening is a Torch memory trick, not math: applying the same update
leaf-wise over a pytree is numerically identical, and lets XLA fuse the update
into the train step (no host round trip, unlike the reference's per-epoch
re-flatten at train.lua:295-301 which is a behavioral no-op).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def adam_init(params):
    zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
    return {
        "m": zeros,
        "v": jax.tree_util.tree_map(jnp.zeros_like, params),
        "t": jnp.zeros((), jnp.int32),
    }


def adam_update(params, grads, state, *, lr=2e-4, beta1=0.5, beta2=0.999, eps=1e-8):
    t = state["t"] + 1
    tf = t.astype(jnp.float32)
    bc1 = 1.0 - beta1 ** tf
    bc2 = 1.0 - beta2 ** tf
    step_size = lr * jnp.sqrt(bc2) / bc1

    def upd(m, v, g, p):
        m = beta1 * m + (1 - beta1) * g
        v = beta2 * v + (1 - beta2) * g * g
        p = p - step_size * m / (jnp.sqrt(v) + eps)
        return m, v, p

    flat_m, treedef = jax.tree_util.tree_flatten(state["m"])
    flat_v = jax.tree_util.tree_leaves(state["v"])
    flat_g = jax.tree_util.tree_leaves(grads)
    flat_p = jax.tree_util.tree_leaves(params)
    new_m, new_v, new_p = [], [], []
    for m, v, g, p in zip(flat_m, flat_v, flat_g, flat_p):
        m2, v2, p2 = upd(m, v, g, p)
        new_m.append(m2)
        new_v.append(v2)
        new_p.append(p2)
    unflat = jax.tree_util.tree_unflatten
    return unflat(treedef, new_p), {
        "m": unflat(treedef, new_m),
        "v": unflat(treedef, new_v),
        "t": t,
    }
