"""Pallas preprocessing kernel == jnp reference composition (interpret mode
on CPU; the same kernel compiles for real on TPU)."""

import numpy as np
import jax.numpy as jnp

from dcgan_sr_tpu.image.ops import box_downsample2, normalize_pm1, rgb2gray
from dcgan_sr_tpu.ops.pallas_kernels import pallas_preprocess


def _rand(*shape, seed=0):
    return jnp.asarray(np.random.RandomState(seed).rand(*shape), jnp.float32)


def test_preprocess_plain():
    x = _rand(3, 1, 64, 64, seed=1)
    hr, lr = pallas_preprocess(x, interpret=True)
    np.testing.assert_allclose(np.asarray(hr), np.asarray(x), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(lr), np.asarray(box_downsample2(x)),
                               rtol=1e-6, atol=1e-7)


def test_preprocess_gray_pm1():
    x = _rand(2, 3, 32, 32, seed=2)
    hr, lr = pallas_preprocess(x, rgb_to_gray=True, to_pm1=True, interpret=True)
    want_hr = normalize_pm1(rgb2gray(x))[:, None]
    np.testing.assert_allclose(np.asarray(hr), np.asarray(want_hr),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(lr),
                               np.asarray(box_downsample2(want_hr)),
                               rtol=1e-5, atol=1e-6)


def test_preprocess_shapes():
    x = _rand(4, 3, 16, 16, seed=3)
    hr, lr = pallas_preprocess(x, rgb_to_gray=True, interpret=True)
    assert hr.shape == (4, 1, 16, 16)
    assert lr.shape == (4, 1, 8, 8)
