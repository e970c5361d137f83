"""Device-side image ops with torch7-`image` semantics.

Where the reference round-trips host<->device per training step (the Lua box-
downsample loops at train.lua:225-230 and per-image MSE loops at :237-239),
these run fused inside the jitted train step — no host sync.

Parity notes:
  - box_downsample2: lr[i,j] = mean of the 2x2 HR block (train.lua:226-230) —
    the degradation model that defines the SR task.
  - rgb2gray: 0.21 R + 0.72 G + 0.07 B (train-gray.lua:54-76; intentionally
    NOT the usual 0.299/0.587/0.114 — see the comment at :55).
  - resize_bilinear: torch7 image.scale's bilinear uses endpoint-aligned
    sampling (scale = (in-1)/(out-1), i.e. align_corners=True); implemented as
    two dense matmuls so it batches onto the MXU.
  - gaussian_window/convolve_full: image.gaussian(11, 1.5/11, amplitude) +
    image.convolve(.., 'full') as used by calSSIM (train-gray-3.lua:201-207);
    'full' output is (H+k-1, W+k-1).
  - to_display: image.toDisplayTensor min-max rescale to [0,1], constant
    images map to 0 (probed by the reference's test_tensor_to_image.lua).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np
from jax import lax


def box_downsample2(x):
    """2x2 box mean over the last two (spatial) dims; works for HW/CHW/NCHW."""
    h, w = x.shape[-2], x.shape[-1]
    shape = x.shape[:-2] + (h // 2, 2, w // 2, 2)
    return x.reshape(shape).mean(axis=(-3, -1))


def rgb2gray(x):
    """Reference weights .21/.72/.07 over the channel axis (-3)."""
    r, g, b = x[..., 0, :, :], x[..., 1, :, :], x[..., 2, :, :]
    return 0.21 * r + 0.72 * g + 0.07 * b


def luma_rec601(x):
    """torch image.load(path, 1) grayscale conversion (rgb2y): .299/.587/.114."""
    r, g, b = x[..., 0, :, :], x[..., 1, :, :], x[..., 2, :, :]
    return 0.299 * r + 0.587 * g + 0.114 * b


@functools.lru_cache(maxsize=64)
def _bilinear_matrix(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) interpolation matrix, endpoint-aligned like image.scale."""
    m = np.zeros((n_out, n_in), np.float32)
    if n_out == 1 or n_in == 1:
        m[:, 0] = 1.0
        return m
    scale = (n_in - 1) / (n_out - 1)
    src = np.arange(n_out) * scale
    lo = np.clip(np.floor(src).astype(int), 0, n_in - 1)
    hi = np.clip(lo + 1, 0, n_in - 1)
    frac = (src - lo).astype(np.float32)
    m[np.arange(n_out), lo] += 1 - frac
    m[np.arange(n_out), hi] += frac
    return m


def resize_bilinear(x, out_h, out_w):
    """Bilinear resize of the last two dims via two dense matmuls (MXU-friendly)."""
    h, w = x.shape[-2], x.shape[-1]
    if (h, w) == (out_h, out_w):
        return x
    a = jnp.asarray(_bilinear_matrix(h, out_h))
    b = jnp.asarray(_bilinear_matrix(w, out_w))
    y = jnp.einsum("oh,...hw->...ow", a, x,
                   precision=lax.Precision.HIGHEST)
    return jnp.einsum("pw,...ow->...op", b, y,
                      precision=lax.Precision.HIGHEST)


@functools.lru_cache(maxsize=8)
def _gaussian_np(size: int, sigma_rel: float) -> np.ndarray:
    """torch image.gaussian(size, sigma, amp): center size/2+0.5 (1-indexed),
    absolute sigma = sigma_rel*size; normalized to sum 1 (calSSIM divides by sum)."""
    sigma = sigma_rel * size
    c = size / 2 + 0.5  # 1-indexed center
    i = np.arange(1, size + 1, dtype=np.float64)
    g1 = np.exp(-(((i - c) / sigma) ** 2) / 2)
    k = np.outer(g1, g1)
    return (k / k.sum()).astype(np.float32)


def gaussian_window(size=11, sigma_rel=1.5 / 11):
    return jnp.asarray(_gaussian_np(size, sigma_rel))


def convolve_full(img, kernel):
    """2-D true convolution, 'full' mode: out (H+k-1, W+k-1) like image.convolve."""
    k = kernel.shape[-1]
    x = img[None, None, :, :]
    w = jnp.flip(kernel, axis=(0, 1))[None, None, :, :]
    dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NCHW", "OIHW", "NCHW"))
    y = lax.conv_general_dilated(
        x, w, (1, 1), ((k - 1, k - 1), (k - 1, k - 1)),
        dimension_numbers=dn, precision=lax.Precision.HIGHEST)
    return y[0, 0]


def normalize_pm1(x):
    """[0,1] -> [-1,1] (`out:mul(2):add(-1)`, donkey_folder.lua:68)."""
    return x * 2.0 - 1.0


def crop(x, top, left, h, w):
    """Static crop of the last two dims (image.crop, donkey_folder.lua:63)."""
    return x[..., top:top + h, left:left + w]


def hflip(x):
    """Horizontal flip of the last dim (image.hflip, donkey_folder.lua:67)."""
    return jnp.flip(x, axis=-1)


def crop_hflip_at(batch, tops, lefts, flips, fine):
    """Device-side trainHook crop + flip at given per-image offsets, batched
    under jit (donkey_folder.lua:63-67: the pixel work of image.crop +
    image.hflip, on-chip).

    batch: (B, C, H, W) with H, W >= fine; tops/lefts: (B,) int offsets with
    top + fine <= H (resp. left + fine <= W); flips: (B,) bool.  The offsets
    are drawn on the HOST (data/folder.py sample_canvas) with the reference's
    single uniform draw over the full aspect-resized image, so the crop
    distribution is exactly the donkey trainHook's — only the O(pixels) work
    moves on-device.
    """
    import jax

    def one(img, top, left, flip):
        out = jax.lax.dynamic_slice(
            img, (0, top, left), (img.shape[0], fine, fine))
        return jnp.where(flip, jnp.flip(out, axis=-1), out)

    return jax.vmap(one)(batch, tops, lefts, flips)


def random_crop_hflip(key, batch, fine):
    """Key-driven variant of crop_hflip_at: per-image random crop to `fine`
    and hflip with p=0.5 (donkey_folder.lua:52-70), batched under jit.

    batch: (B, C, H, W) with H, W >= fine; key: jax PRNG key.  Each image gets
    independent crop offsets and flip coins.  NOTE: uniform over the BATCH
    canvas only — the train step uses host-drawn offsets (crop_hflip_at) so
    the composed host-crop + device-crop distribution matches the reference's
    one-draw uniform over the full aspect-resized image.
    """
    import jax

    b, _, h, w = batch.shape
    k1, k2, k3 = jax.random.split(key, 3)
    # reference offset range: ceil(uniform(1e-2, dim-fine)) = {1..dim-fine},
    # 0-based in image.crop — offset 0 is never sampled (donkey:57-62)
    tops = jax.random.randint(k1, (b,), min(1, h - fine), h - fine + 1)
    lefts = jax.random.randint(k2, (b,), min(1, w - fine), w - fine + 1)
    flips = jax.random.bernoulli(k3, 0.5, (b,))
    return crop_hflip_at(batch, tops, lefts, flips, fine)


def to_display(x):
    """image.toDisplayTensor min-max rescale: (x-min)/(max-min); constant -> 0."""
    lo = x.min()
    hi = x.max()
    rng = hi - lo
    return jnp.where(rng > 0, (x - lo) / jnp.where(rng > 0, rng, 1.0),
                     jnp.zeros_like(x))
