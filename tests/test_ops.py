"""Golden tests: ops must bit-match Torch semantics (torch-CPU as the oracle).

The reference's compute is Torch7 C/CUDA; torch-CPU implements the same math
(SpatialConvolution == nn.Conv2d, SpatialFullConvolution == nn.ConvTranspose2d,
SpatialBatchNormalization == nn.BatchNorm2d in train mode)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from dcgan_sr_tpu.ops import (
    adam_init,
    adam_update,
    batch_norm,
    conv2d,
    conv_transpose2d,
    leaky_relu,
    upsample_nearest,
)

RTOL, ATOL = 1e-5, 1e-5


def _rand(*shape, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randn(*shape).astype(np.float32)


@pytest.mark.parametrize("k,s,p,hw", [(4, 2, 1, 64), (3, 1, 0, 8), (4, 1, 0, 4), (2, 1, 0, 2)])
def test_conv2d_matches_torch(k, s, p, hw):
    x = _rand(2, 3, hw, hw, seed=1)
    w = _rand(5, 3, k, k, seed=2)
    ours = np.asarray(conv2d(jnp.asarray(x), jnp.asarray(w), s, p))
    ref = F.conv2d(torch.from_numpy(x), torch.from_numpy(w), stride=s, padding=p).numpy()
    np.testing.assert_allclose(ours, ref, rtol=RTOL, atol=ATOL)


@pytest.mark.parametrize("k,s,p,hw", [(4, 2, 1, 32), (4, 2, 1, 4), (4, 2, 1, 2)])
def test_conv_transpose2d_matches_torch(k, s, p, hw):
    x = _rand(2, 3, hw, hw, seed=3)
    w = _rand(3, 6, k, k, seed=4)  # (Cin, Cout, kH, kW) torch layout
    out = conv_transpose2d(jnp.asarray(x), jnp.asarray(w), s, p)
    ref = F.conv_transpose2d(torch.from_numpy(x), torch.from_numpy(w),
                             stride=s, padding=p).numpy()
    # k4s2p1 must take hw -> 2*hw exactly (train.lua:99: 32 -> 64)
    assert out.shape == (2, 6, 2 * hw, 2 * hw)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=RTOL, atol=ATOL)


def test_batch_norm_train_mode_matches_torch():
    x = _rand(4, 7, 8, 8, seed=5)
    scale = _rand(7, seed=6)
    bias = _rand(7, seed=7)
    y, _ = batch_norm(jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias))
    ref = F.batch_norm(
        torch.from_numpy(x), None, None,
        weight=torch.from_numpy(scale), bias=torch.from_numpy(bias),
        training=True, eps=1e-5).numpy()
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-4, atol=1e-4)


def test_batch_norm_running_stats():
    x = _rand(4, 3, 6, 6, seed=8)
    scale, bias = np.ones(3, np.float32), np.zeros(3, np.float32)
    state = {"mean": jnp.zeros(3), "var": jnp.ones(3)}
    _, ns = batch_norm(jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias),
                       state=state, train=True)
    bn = torch.nn.BatchNorm2d(3, eps=1e-5, momentum=0.1)
    bn.train()
    bn(torch.from_numpy(x))
    np.testing.assert_allclose(np.asarray(ns["mean"]), bn.running_mean.numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ns["var"]), bn.running_var.numpy(),
                               rtol=1e-5, atol=1e-6)


def test_leaky_relu_and_upsample():
    x = _rand(1, 2, 4, 4, seed=9)
    np.testing.assert_allclose(
        np.asarray(leaky_relu(jnp.asarray(x), 0.2)),
        F.leaky_relu(torch.from_numpy(x), 0.2).numpy(), rtol=RTOL, atol=ATOL)
    up = upsample_nearest(jnp.asarray(x), 2)
    ref = F.interpolate(torch.from_numpy(x), scale_factor=2, mode="nearest").numpy()
    np.testing.assert_allclose(np.asarray(up), ref, rtol=0, atol=0)


def test_adam_matches_torch7_formula():
    """torch/optim adam: x -= lr*sqrt(1-b2^t)/(1-b1^t) * m/(sqrt(v)+eps)."""
    p = {"a": jnp.asarray(_rand(5, seed=10)), "b": jnp.asarray(_rand(3, 3, seed=11))}
    g1 = {"a": jnp.asarray(_rand(5, seed=12)), "b": jnp.asarray(_rand(3, 3, seed=13))}
    g2 = {"a": jnp.asarray(_rand(5, seed=14)), "b": jnp.asarray(_rand(3, 3, seed=15))}
    lr, b1, b2, eps = 2e-4, 0.5, 0.999, 1e-8

    st = adam_init(p)
    p1, st = adam_update(p, g1, st, lr=lr, beta1=b1, beta2=b2, eps=eps)
    p2, st = adam_update(p1, g2, st, lr=lr, beta1=b1, beta2=b2, eps=eps)

    # independent NumPy re-derivation of the torch7 update
    for key in ("a", "b"):
        x = np.asarray(p[key], np.float64)
        m = np.zeros_like(x)
        v = np.zeros_like(x)
        for t, g in enumerate([np.asarray(g1[key]), np.asarray(g2[key])], start=1):
            m = b1 * m + (1 - b1) * g
            v = b2 * v + (1 - b2) * g * g
            step = lr * np.sqrt(1 - b2 ** t) / (1 - b1 ** t)
            x = x - step * m / (np.sqrt(v) + eps)
        np.testing.assert_allclose(np.asarray(p2[key]), x, rtol=1e-6, atol=1e-7)


def test_adam_state_counts_steps():
    p = {"a": jnp.ones(3)}
    st = adam_init(p)
    _, st = adam_update(p, p, st)
    assert int(st["t"]) == 1
