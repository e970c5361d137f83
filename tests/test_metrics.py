"""Metric parity tests: PSNR clamp, per-image MSE divisors, SSIM properties."""

import numpy as np
import jax.numpy as jnp

from dcgan_sr_tpu.metrics import (
    cal_mse_hw,
    cal_mse_quarter,
    cal_psnr,
    cal_psnr_batch,
    cal_ssim,
    cal_ssim_batch,
)


def _rand(*shape, seed=0):
    return np.random.RandomState(seed).rand(*shape).astype(np.float32)


def test_psnr_formula():
    a = _rand(64, 64, seed=1)
    b = _rand(64, 64, seed=2)
    got = float(cal_psnr(jnp.asarray(a), jnp.asarray(b)))
    mse = np.sum((a - b) ** 2) / (64 * 64)
    want = 10 * np.log10(1.0 / mse)
    np.testing.assert_allclose(got, want, rtol=1e-4)  # fp32 sum-order slack


def test_psnr_identical_clamps_to_99():
    a = jnp.asarray(_rand(8, 8, seed=3))
    assert float(cal_psnr(a, a)) == 99.0


def test_mse_divisors():
    r = _rand(5, 3, 8, 8, seed=4)
    f = _rand(5, 3, 8, 8, seed=5)
    q = np.asarray(cal_mse_quarter(jnp.asarray(r), jnp.asarray(f)))
    hw = np.asarray(cal_mse_hw(jnp.asarray(r), jnp.asarray(f)))
    per = ((r - f) ** 2).sum(axis=(1, 2, 3))
    np.testing.assert_allclose(q, per / (4 * 3 * 8 * 8), rtol=1e-6)
    np.testing.assert_allclose(hw, per / (8 * 8), rtol=1e-6)


def test_ssim_self_is_one():
    a = jnp.asarray(_rand(64, 64, seed=6))
    np.testing.assert_allclose(float(cal_ssim(a, a)), 1.0, atol=1e-5)


def test_ssim_decreases_with_noise():
    a = _rand(64, 64, seed=7)
    small = a + 0.01 * np.random.RandomState(8).randn(64, 64).astype(np.float32)
    big = a + 0.3 * np.random.RandomState(9).randn(64, 64).astype(np.float32)
    s_small = float(cal_ssim(jnp.asarray(a), jnp.asarray(small)))
    s_big = float(cal_ssim(jnp.asarray(a), jnp.asarray(big)))
    assert s_big < s_small < 1.0


def test_ssim_matches_independent_numpy_full_conv():
    """Independent scipy re-derivation of the reference formula."""
    from scipy.signal import convolve2d

    a = _rand(32, 32, seed=10)
    b = _rand(32, 32, seed=11)
    got = float(cal_ssim(jnp.asarray(a), jnp.asarray(b)))

    x = (a + 1) / 2 * 255.0
    y = (b + 1) / 2 * 255.0
    sigma = 1.5
    i = np.arange(1, 12, dtype=np.float64)
    c = 11 / 2 + 0.5
    g = np.exp(-(((i - c) / sigma) ** 2) / 2)
    win = np.outer(g, g)
    win /= win.sum()
    C1, C2 = (0.01 * 255) ** 2, (0.03 * 255) ** 2
    mu1 = convolve2d(x, win, mode="full")
    mu2 = convolve2d(y, win, mode="full")
    s1 = convolve2d(x * x, win, mode="full") - mu1 ** 2
    s2 = convolve2d(y * y, win, mode="full") - mu2 ** 2
    s12 = convolve2d(x * y, win, mode="full") - mu1 * mu2
    m = ((2 * mu1 * mu2 + C1) * (2 * s12 + C2)) / ((mu1**2 + mu2**2 + C1) * (s1 + s2 + C2))
    np.testing.assert_allclose(got, m.mean(), rtol=1e-4)


def test_batched_metrics():
    a = jnp.asarray(_rand(3, 16, 16, seed=12))
    b = jnp.asarray(_rand(3, 16, 16, seed=13))
    assert cal_psnr_batch(a, b).shape == (3,)
    assert cal_ssim_batch(a, b).shape == (3,)
