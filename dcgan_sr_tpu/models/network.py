"""Spec-driven network interpreter (functional replacement for nn.Sequential).

A network is a tuple of layer dicts; parameters live in a pytree (list of
per-layer dicts), BN running stats in a parallel state pytree.  Mirrors the
reference's `nn.Sequential` module chains (train.lua:97-139) but as pure
functions over pytrees, so `jax.jit`/`jax.grad`/`shard_map` compose directly.

Layer kinds:
  {"kind": "upsample", "factor": f}
  {"kind": "conv",  "cin","cout","k","s","p", "bn": bool, "act": str|None}
  {"kind": "convT", "cin","cout","k","s","p", "bn": bool, "act": str|None}
  {"kind": "flatten"}   # View(1): (B,1,1,1) -> (B,)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import nn as N
from ..ops.init import init_bn, init_conv

_ACTS = {
    "relu": N.relu,
    "lrelu": lambda x: N.leaky_relu(x, 0.2),
    "sigmoid": N.sigmoid,
    "tanh": N.tanh,
    None: lambda x: x,
}


def init_network(key, spec, dtype=jnp.float32):
    """Returns (params, state) pytrees for a layer spec tuple."""
    params, state = [], []
    for layer in spec:
        kind = layer["kind"]
        if kind in ("conv", "convT"):
            key, kw, kb = jax.random.split(key, 3)
            if kind == "conv":
                wshape = (layer["cout"], layer["cin"], layer["k"], layer["k"])
            else:
                wshape = (layer["cin"], layer["cout"], layer["k"], layer["k"])
            p = {"w": init_conv(kw, wshape, dtype)}
            s = {}
            if layer.get("bn"):
                scale, bias, bn_state = init_bn(kb, layer["cout"], dtype)
                p["bn_scale"], p["bn_bias"] = scale, bias
                s["bn"] = bn_state
            params.append(p)
            state.append(s)
        else:
            params.append({})
            state.append({})
    return params, state


def apply_network(spec, params, x, state=None, *, train=True, compute_dtype=None,
                  axis_name=None, fast=False):
    """Forward pass. Returns (y, new_state).

    `train=True` uses batch statistics in BN — reference parity: the Lua
    scripts never switch to evaluate mode, so even their eval/inference paths
    normalize with batch stats (SURVEY.md §7.4).  `axis_name` turns on
    cross-replica BN for data-parallel shards (see ops.nn.batch_norm).

    `fast=True` rewrites the k4s2p1 conv pair into their MXU-efficient
    sub-pixel / space-to-depth forms (ops/fast.py) — identical math, ~4x the
    MXU lane utilization for the small-channel generators.
    """
    if fast:
        from ..ops import fast as F
    new_state = []
    for i, layer in enumerate(spec):
        kind = layer["kind"]
        p = params[i]
        s = state[i] if state is not None else {}
        ns = {}
        if kind == "upsample":
            x = N.upsample_nearest(x, layer["factor"])
        elif kind == "flatten":
            x = x.reshape(x.shape[0], -1)[:, 0]
        elif kind in ("conv", "convT"):
            fast_ok = (fast and layer["k"] == 4 and layer["s"] == 2
                       and layer["p"] == 1 and x.shape[-1] % 2 == 0
                       and x.shape[-2] % 2 == 0)
            if kind == "conv":
                if fast_ok:
                    x = F.conv2d_s2d(x, p["w"], compute_dtype=compute_dtype)
                else:
                    # custom-VJP variant: activation grads route through the
                    # sibling op (avoids XLA's big spatial reverses)
                    x = N.conv2d_cv(x, p["w"], layer["s"], layer["p"],
                                    compute_dtype)
            else:
                if fast_ok:
                    x = F.conv_transpose2d_subpixel(
                        x, p["w"], compute_dtype=compute_dtype)
                else:
                    x = N.conv_transpose2d_cv(x, p["w"], layer["s"],
                                              layer["p"], compute_dtype)
            if layer.get("bn"):
                x, bn_ns = N.batch_norm(
                    x, p["bn_scale"], p["bn_bias"],
                    state=s.get("bn"), train=train, axis_name=axis_name)
                if bn_ns is not None:
                    ns["bn"] = bn_ns
            x = _ACTS[layer.get("act")](x)
        else:
            raise ValueError(f"unknown layer kind {kind!r}")
        new_state.append(ns)
    if compute_dtype is not None:
        # bf16 compute path: hand fp32 back to losses/labels/metrics
        x = x.astype(jnp.float32)
    return x, new_state


def param_count(params):
    return sum(int(p.size) for p in jax.tree_util.tree_leaves(params))
