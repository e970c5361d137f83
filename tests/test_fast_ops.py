"""Sub-pixel / space-to-depth conv rewrites must equal the reference ops."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dcgan_sr_tpu.core import get_config
from dcgan_sr_tpu.models import apply_network, generator_spec, init_network
from dcgan_sr_tpu.ops.fast import (
    conv2d_s2d,
    conv_transpose2d_subpixel,
    depth_to_space,
    space_to_depth,
)
from dcgan_sr_tpu.ops.nn import conv2d, conv_transpose2d


def _rand(*shape, seed=0):
    return jnp.asarray(np.random.RandomState(seed).randn(*shape), jnp.float32)


def test_s2d_roundtrip():
    x = _rand(2, 3, 8, 8, seed=1)
    y = space_to_depth(x, 2)
    assert y.shape == (2, 12, 4, 4)
    np.testing.assert_array_equal(np.asarray(depth_to_space(y, 2)), np.asarray(x))
    # channel order (c, u, v): folded channel c*4 + u*2 + v holds x[c, 2i+u, 2j+v]
    np.testing.assert_array_equal(np.asarray(y[0, 1]), np.asarray(x[0, 0, 0::2, 1::2]))


@pytest.mark.parametrize("ci,co,hw", [(1, 32, 32), (16, 8, 16), (32, 16, 8)])
def test_subpixel_convT_matches_reference(ci, co, hw):
    x = _rand(3, ci, hw, hw, seed=2)
    w = _rand(ci, co, 4, 4, seed=3)
    ref = conv_transpose2d(x, w, 2, 1)
    fast = conv_transpose2d_subpixel(x, w)
    assert fast.shape == ref.shape == (3, co, 2 * hw, 2 * hw)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("ci,co,hw", [(1, 64, 64), (8, 16, 32), (32, 1, 16)])
def test_s2d_conv_matches_reference(ci, co, hw):
    x = _rand(3, ci, hw, hw, seed=4)
    w = _rand(co, ci, 4, 4, seed=5)
    ref = conv2d(x, w, 2, 1)
    fast = conv2d_s2d(x, w)
    assert fast.shape == ref.shape == (3, co, hw // 2, hw // 2)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("variant", ["gray-3", "gray-patch-batch", "rgb-full"])
def test_fast_generator_matches_standard(variant):
    cfg = get_config(variant, env_override=False, ngf=4)
    spec = generator_spec(cfg)
    params, state = init_network(jax.random.PRNGKey(0), spec)
    x = _rand(2, cfg.nc, cfg.train_size // 2, cfg.train_size // 2, seed=6)
    ref, _ = apply_network(spec, params, x, state)
    fast, _ = apply_network(spec, params, x, state, fast=True)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.slow  # opt-in rewrites (measured slower than XLA); grad check is heavy
def test_fast_gradients_match():
    cfg = get_config("gray-3", env_override=False, ngf=4)
    spec = generator_spec(cfg)
    params, state = init_network(jax.random.PRNGKey(1), spec)
    x = _rand(2, 1, 32, 32, seed=7)

    def loss(p, fast):
        y, _ = apply_network(spec, p, x, state, fast=fast)
        return (y ** 2).sum()

    g_ref = jax.grad(lambda p: loss(p, False))(params)
    g_fast = jax.grad(lambda p: loss(p, True))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_fast)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)
