"""Spec <-> PyTorch bridge: build torch.nn replicas of any variant's networks.

The reference's models are torch7 nn.Sequential chains (e.g.
train-gray-3.lua:52-95); our models are layer-spec pytrees (models/specs.py).
This module renders a spec as a torch.nn.Sequential with identical semantics
(NCHW, OIHW conv / IOHW conv-transpose weights, BN eps 1e-5 momentum 0.1 —
ops/nn.py keeps torch layouts, so every copy below is reshape-free) and copies
weights in either direction.  Used by the trained-torch-baseline protocol
(tools/torch_baseline.py) and the cross-stack bit-compare tests.

torch is imported lazily: the package works without it; only these entry
points require the CPU torch wheel.
"""

from __future__ import annotations

import numpy as np


def spec_to_torch(spec):
    """Render a layer spec as torch.nn.Sequential (train mode, no biases)."""
    import torch.nn as nn

    mods = []
    for layer in spec:
        kind = layer["kind"]
        if kind == "upsample":
            mods.append(nn.UpsamplingNearest2d(scale_factor=layer["factor"]))
            continue
        if kind == "flatten":
            mods.append(nn.Flatten(0))
            continue
        k, s, p = layer["k"], layer["s"], layer["p"]
        cin, cout = layer["cin"], layer["cout"]
        if kind == "conv":
            mods.append(nn.Conv2d(cin, cout, k, s, p, bias=False))
        elif kind == "convT":
            mods.append(nn.ConvTranspose2d(cin, cout, k, s, p, bias=False))
        else:
            raise KeyError(kind)
        if layer.get("bn"):
            mods.append(nn.BatchNorm2d(cout))  # eps 1e-5, momentum 0.1
        act = layer.get("act")
        if act == "relu":
            mods.append(nn.ReLU())
        elif act == "lrelu":
            mods.append(nn.LeakyReLU(0.2))
        elif act == "sigmoid":
            mods.append(nn.Sigmoid())
        elif act == "tanh":
            mods.append(nn.Tanh())
        elif act is not None:
            raise KeyError(act)
    seq = nn.Sequential(*mods)
    seq.train()
    return seq


def _param_modules(seq):
    import torch.nn as nn
    return [m for m in seq if isinstance(
        m, (nn.Conv2d, nn.ConvTranspose2d, nn.BatchNorm2d))]


def copy_params_to_torch(seq, params):
    """Load our params pytree into a spec_to_torch module (in place)."""
    import torch

    mods = _param_modules(seq)
    i = 0
    for p in params:
        if not p:
            continue
        mods[i].weight.data = torch.from_numpy(np.asarray(p["w"]).copy())
        i += 1
        if "bn_scale" in p:
            bn = mods[i]
            i += 1
            bn.weight.data = torch.from_numpy(
                np.asarray(p["bn_scale"]).copy())
            bn.bias.data = torch.from_numpy(np.asarray(p["bn_bias"]).copy())
    if i != len(mods):
        raise ValueError(f"consumed {i} torch modules, model has {len(mods)}")
    return seq


def copy_params_from_torch(seq, params):
    """Read a torch replica's weights back into a (new) params pytree."""
    import jax.numpy as jnp

    mods = _param_modules(seq)
    out = [dict(p) for p in params]
    i = 0
    for p in out:
        if not p:
            continue
        w = mods[i].weight.detach().numpy()
        i += 1
        if w.shape != np.asarray(p["w"]).shape:
            raise ValueError(f"shape {w.shape} != {np.asarray(p['w']).shape}")
        p["w"] = jnp.asarray(w)
        if "bn_scale" in p:
            bn = mods[i]
            i += 1
            p["bn_scale"] = jnp.asarray(bn.weight.detach().numpy())
            p["bn_bias"] = jnp.asarray(bn.bias.detach().numpy())
    if i != len(mods):
        raise ValueError(f"consumed {i} torch modules, model has {len(mods)}")
    return out


class Torch7Adam:
    """torch/optim adam (reference train.lua:280-283): per-element
    x -= lr * sqrt(1-b2^t)/(1-b1^t) * m/(sqrt(v)+eps) — eps OUTSIDE the bias
    correction, unlike torch.optim.Adam."""

    def __init__(self, params, lr=2e-4, b1=0.5, b2=0.999, eps=1e-8):
        import torch
        self.params = list(params)
        self.m = [torch.zeros_like(p) for p in self.params]
        self.v = [torch.zeros_like(p) for p in self.params]
        self.t = 0
        self.lr, self.b1, self.b2, self.eps = lr, b1, b2, eps

    def step(self):
        import torch
        self.t += 1
        step_size = (self.lr * (1 - self.b2 ** self.t) ** 0.5
                     / (1 - self.b1 ** self.t))
        with torch.no_grad():
            for p, m, v in zip(self.params, self.m, self.v):
                if p.grad is None:
                    continue
                g = p.grad
                m.mul_(self.b1).add_(g, alpha=1 - self.b1)
                v.mul_(self.b2).addcmul_(g, g, value=1 - self.b2)
                p.sub_(step_size * m / (v.sqrt() + self.eps))

    def zero_grad(self):
        for p in self.params:
            p.grad = None
