"""Custom-VJP conv pair: gradients must equal autodiff of the raw ops.

The hand adjoints (ops/nn.py conv2d_cv / conv_transpose2d_cv) exist purely for
TPU performance (+23%); any numerical divergence from autodiff is a bug.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dcgan_sr_tpu.ops.nn import (
    conv2d,
    conv2d_cv,
    conv_transpose2d,
    conv_transpose2d_cv,
)


def _rand(*shape, seed=0):
    return jnp.asarray(np.random.RandomState(seed).randn(*shape), jnp.float32)


def _grads(fn, x, w):
    return jax.grad(lambda x_, w_: (fn(x_, w_) ** 2).sum(), argnums=(0, 1))(x, w)


@pytest.mark.parametrize("ci,co,hw", [(1, 32, 8), (16, 8, 16), (3, 24, 32)])
def test_convT_cv_grads_match_autodiff(ci, co, hw):
    x, w = _rand(2, ci, hw, hw, seed=1), _rand(ci, co, 4, 4, seed=2)
    ga = _grads(lambda x_, w_: conv_transpose2d(x_, w_, 2, 1), x, w)
    gb = _grads(lambda x_, w_: conv_transpose2d_cv(x_, w_, 2, 1, None), x, w)
    for a, b in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("ci,co,hw,k,s,p", [
    (1, 64, 64, 4, 2, 1),   # dcgan64 D first layer
    (8, 16, 32, 4, 2, 1),   # hourglass down-stack
    (16, 8, 8, 3, 1, 0),    # patch-D valid conv (autodiff dw fallback)
    (32, 1, 4, 4, 1, 0),    # D head (k4 valid, autodiff dw fallback)
    (4, 1, 2, 2, 1, 0),     # patch-D head
])
def test_conv_cv_grads_match_autodiff(ci, co, hw, k, s, p):
    x, w = _rand(2, ci, hw, hw, seed=3), _rand(co, ci, k, k, seed=4)
    ga = _grads(lambda x_, w_: conv2d(x_, w_, s, p), x, w)
    gb = _grads(lambda x_, w_: conv2d_cv(x_, w_, s, p, None), x, w)
    for a, b in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_cv_forward_identical():
    x, w = _rand(2, 3, 16, 16, seed=5), _rand(6, 3, 4, 4, seed=6)
    np.testing.assert_array_equal(
        np.asarray(conv2d_cv(x, w, 2, 1, None)),
        np.asarray(conv2d(x, w, 2, 1)))
    wt = _rand(3, 6, 4, 4, seed=7)
    np.testing.assert_array_equal(
        np.asarray(conv_transpose2d_cv(x, wt, 2, 1, None)),
        np.asarray(conv_transpose2d(x, wt, 2, 1)))


def test_cv_bf16_grads_finite():
    x, w = _rand(2, 8, 16, 16, seed=8), _rand(8, 4, 4, 4, seed=9)
    g = jax.grad(lambda w_: (conv_transpose2d_cv(
        x, w_, 2, 1, jnp.bfloat16).astype(jnp.float32) ** 2).sum())(w)
    assert np.isfinite(np.asarray(g)).all()
