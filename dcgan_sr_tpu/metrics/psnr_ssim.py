"""PSNR / SSIM / per-image-MSE metrics with the reference's exact formulas.

The reference defines several inconsistent variants (SURVEY.md §2.3 metrics);
all are preserved:

  cal_psnr        MSE = sum((a-b)^2)/(H*W); 10*log10(1/MSE); MSE<=0 -> 99
                  (train-gray-3.lua:143-151; assumes [0,1] range)
  cal_mse_quarter per-image sum/(4*C*H*W) — D's fake label in train.lua:193-195
  cal_mse_hw      per-image sum/(H*W)     — train-gray.lua:199-201 (the divisor
                  is H*W regardless of channel count)
  cal_ssim        Wang et al. SSIM with K1=.01 K2=.03 L=255, 11x11 Gaussian
                  sigma 1.5, 'full' convolution, and the reference's
                  (x+1)/2*255 input rescale — applied even when the generator
                  outputs [0,1] (train-gray-3.lua:156-221, quirk at :192-193).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..image.ops import convolve_full, gaussian_window


def cal_psnr(img1, img2):
    """PSNR over 2-D images (peak 1.0). Scalar jnp output; MSE<=0 clamps to 99."""
    h, w = img1.shape[-2], img1.shape[-1]
    mse = jnp.sum((img1 - img2) ** 2) / (h * w)
    return jnp.where(mse > 0, 10.0 * jnp.log10(1.0 / jnp.maximum(mse, 1e-38)), 99.0)


def cal_psnr_batch(a, b):
    """vmapped cal_psnr over the leading axis of (B, H, W) arrays."""
    return jax.vmap(cal_psnr)(a, b)


def cal_mse_quarter(real, fake):
    """Per-image sum((r-f)^2)/(4*C*H*W) over (B, C, H, W) -> (B,) (train.lua:193)."""
    c, h, w = real.shape[-3], real.shape[-2], real.shape[-1]
    return jnp.sum((real - fake) ** 2, axis=(-3, -2, -1)) / (4 * c * h * w)


def cal_mse_hw(real, fake):
    """Per-image sum((r-f)^2)/(H*W) over (B, C, H, W) -> (B,) (train-gray.lua:199)."""
    h, w = real.shape[-2], real.shape[-1]
    return jnp.sum((real - fake) ** 2, axis=(-3, -2, -1)) / (h * w)


_K1, _K2, _L = 0.01, 0.03, 255.0
_C1 = (_K1 * _L) ** 2
_C2 = (_K2 * _L) ** 2


def cal_ssim(img1, img2):
    """Mean SSIM between two 2-D images, reference-exact (train-gray-3.lua:156-221)."""
    x = (img1.astype(jnp.float32) + 1.0) / 2.0 * 255.0
    y = (img2.astype(jnp.float32) + 1.0) / 2.0 * 255.0
    win = gaussian_window(11, 1.5 / 11)

    mu1 = convolve_full(x, win)
    mu2 = convolve_full(y, win)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = convolve_full(x * x, win) - mu1_sq
    sigma2_sq = convolve_full(y * y, win) - mu2_sq
    sigma12 = convolve_full(x * y, win) - mu1_mu2

    ssim_map = ((2 * mu1_mu2 + _C1) * (2 * sigma12 + _C2)) / (
        (mu1_sq + mu2_sq + _C1) * (sigma1_sq + sigma2_sq + _C2))
    return jnp.mean(ssim_map)


def cal_ssim_batch(a, b):
    return jax.vmap(cal_ssim)(a, b)
