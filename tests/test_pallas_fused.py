"""Exactness of the fused convT+BN+ReLU+conv Pallas kernels (interpret mode)
against the unfused composition used by the network interpreter.

Covers both generations: the NHWC draft (ops/pallas_fused.py) and the
Mosaic-safe flat-lane form (ops/pallas_bulge.py) that actually lowers on
real TPUs — see docs/fused_bulge.md."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dcgan_sr_tpu.ops import nn as N

# The fused kernels are a measured-negative opt-in artifact (docs/fused_bulge.md),
# not on any default path — exactness checks live in the --runslow tier.
pytestmark = pytest.mark.slow
from dcgan_sr_tpu.ops.pallas_fused import fused_convT_bn_relu_conv
from dcgan_sr_tpu.ops.pallas_bulge import fused_bulge_fwd


def _reference_pair(x, wT, scale, bias, wC, eps=1e-5):
    h = N.conv_transpose2d(x, wT, 2, 1)
    mean = h.mean(axis=(0, 2, 3))
    var = ((h - mean[None, :, None, None]) ** 2).mean(axis=(0, 2, 3))
    hn = (h - mean[None, :, None, None]) / jnp.sqrt(
        var[None, :, None, None] + eps)
    hn = hn * scale[None, :, None, None] + bias[None, :, None, None]
    hr = jnp.maximum(hn, 0.0)
    y = N.conv2d(hr, wC, 2, 1)
    return y, (mean, var)


@pytest.mark.parametrize("bsz,ci,cm,co,hw,tm", [
    (2, 5, 4, 6, 16, 8),
    (1, 16, 8, 16, 32, 16),   # gray-3 bulge channel geometry
    (3, 3, 2, 3, 8, 8),       # single tile (first == last)
])
def test_fused_pair_matches_composition(bsz, ci, cm, co, hw, tm):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(bsz, ci, hw, hw).astype(np.float32))
    wT = jnp.asarray(0.1 * rng.randn(ci, cm, 4, 4).astype(np.float32))
    wC = jnp.asarray(0.1 * rng.randn(co, cm, 4, 4).astype(np.float32))
    scale = jnp.asarray(1.0 + 0.1 * rng.randn(cm).astype(np.float32))
    bias = jnp.asarray(0.1 * rng.randn(cm).astype(np.float32))

    y_ref, (m_ref, v_ref) = _reference_pair(x, wT, scale, bias, wC)
    y, (m, v) = fused_convT_bn_relu_conv(x, wT, scale, bias, wC, tm=tm,
                                         interpret=True)
    np.testing.assert_allclose(np.asarray(m), np.asarray(m_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(v), np.asarray(v_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("bsz,ci,cm,co,h,w,tm", [
    (1, 8, 2, 4, 16, 128, 8),     # minimal legal flat-lane geometry
    (2, 16, 8, 16, 32, 128, 16),  # gray-3 bulge channel geometry
    (1, 8, 4, 8, 8, 128, 8),      # single band (first == last)
])
def test_flat_lane_bulge_matches_composition(bsz, ci, cm, co, h, w, tm):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(bsz, ci, h, w).astype(np.float32))
    wT = jnp.asarray(0.1 * rng.randn(ci, cm, 4, 4).astype(np.float32))
    wC = jnp.asarray(0.1 * rng.randn(co, cm, 4, 4).astype(np.float32))
    scale = jnp.asarray(1.0 + 0.1 * rng.randn(cm).astype(np.float32))
    bias = jnp.asarray(0.1 * rng.randn(cm).astype(np.float32))

    y_ref, (m_ref, v_ref) = _reference_pair(x, wT, scale, bias, wC)
    y, (m, v) = fused_bulge_fwd(x, wT, scale, bias, wC, tm=tm,
                                interpret=True)
    np.testing.assert_allclose(np.asarray(m), np.asarray(m_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(v), np.asarray(v_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=2e-4, atol=2e-4)


def test_fused_pair_gray3_shapes():
    """The actual bulge geometry at reduced spatial size: shape plumbing."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(2, 16, 32, 32).astype(np.float32))
    wT = jnp.asarray(0.05 * rng.randn(16, 8, 4, 4).astype(np.float32))
    wC = jnp.asarray(0.05 * rng.randn(16, 8, 4, 4).astype(np.float32))
    y, (m, v) = fused_convT_bn_relu_conv(
        x, wT, jnp.ones(8), jnp.zeros(8), wC, tm=16, interpret=True)
    assert y.shape == (2, 16, 32, 32)
    assert m.shape == (8,) and v.shape == (8,)
    assert bool(jnp.all(jnp.isfinite(y)))
