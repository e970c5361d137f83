"""Image-op parity tests (box downsample, rgb2gray, bilinear, gaussian,
'full' convolution, display normalization, patches)."""

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from dcgan_sr_tpu.image import (
    box_downsample2,
    convolve_full,
    extract_grid_patches,
    extract_overlap_patches,
    gaussian_window,
    normalize_pm1,
    reassemble_grid_patches,
    resize_bilinear,
    rgb2gray,
    stitch_overlap_naive,
    to_display,
)
from dcgan_sr_tpu.image.patches import overlap_grid


def _rand(*shape, seed=0):
    return np.random.RandomState(seed).rand(*shape).astype(np.float32)


def test_box_downsample2_matches_loop():
    x = _rand(2, 3, 8, 8, seed=1)
    got = np.asarray(box_downsample2(jnp.asarray(x)))
    # reference loop (train.lua:226-230), 0-indexed
    want = np.zeros((2, 3, 4, 4), np.float32)
    for i in range(4):
        for j in range(4):
            want[:, :, i, j] = (x[:, :, 2 * i, 2 * j] + x[:, :, 2 * i + 1, 2 * j]
                                + x[:, :, 2 * i, 2 * j + 1]
                                + x[:, :, 2 * i + 1, 2 * j + 1]) / 4
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_rgb2gray_weights():
    x = _rand(3, 5, 5, seed=2)
    got = np.asarray(rgb2gray(jnp.asarray(x)))
    want = 0.21 * x[0] + 0.72 * x[1] + 0.07 * x[2]
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_resize_bilinear_matches_torch_align_corners():
    # torch7 image.scale bilinear is endpoint-aligned; F.interpolate with
    # align_corners=True implements the same sampling
    x = _rand(1, 1, 32, 32, seed=3)
    got = np.asarray(resize_bilinear(jnp.asarray(x), 64, 64))
    want = F.interpolate(torch.from_numpy(x), size=(64, 64), mode="bilinear",
                         align_corners=True).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    # downscale path (JPEG 218x178 -> 64x64 in the indexed loaders)
    y = _rand(1, 1, 218, 178, seed=4)
    got = np.asarray(resize_bilinear(jnp.asarray(y), 64, 64))
    want = F.interpolate(torch.from_numpy(y), size=(64, 64), mode="bilinear",
                         align_corners=True).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_gaussian_window():
    w = np.asarray(gaussian_window(11, 1.5 / 11))
    assert w.shape == (11, 11)
    np.testing.assert_allclose(w.sum(), 1.0, rtol=1e-6)
    # symmetric, peaked at center, absolute sigma 1.5
    assert w[5, 5] == w.max()
    np.testing.assert_allclose(w, w.T, rtol=1e-6)
    np.testing.assert_allclose(w[5, 4] / w[5, 5], np.exp(-0.5 / 1.5**2), rtol=1e-5)


def test_convolve_full_shape_and_value():
    img = _rand(6, 6, seed=5)
    k = _rand(3, 3, seed=6)
    got = np.asarray(convolve_full(jnp.asarray(img), jnp.asarray(k)))
    assert got.shape == (8, 8)
    from scipy.signal import convolve2d
    want = convolve2d(img, k, mode="full")
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_to_display_semantics():
    x = jnp.asarray(_rand(4, 4, seed=7)) * 3 - 1
    y = np.asarray(to_display(x))
    assert abs(y.min()) < 1e-6 and abs(y.max() - 1) < 1e-6
    # constant images map to 0 (probed by test_tensor_to_image.lua)
    for c in [0.0, 0.5, 1.0, -1.0, -0.5]:
        z = np.asarray(to_display(jnp.full((4, 4), c)))
        np.testing.assert_allclose(z, 0.0)


def test_normalize_pm1():
    x = jnp.asarray([0.0, 0.5, 1.0])
    np.testing.assert_allclose(np.asarray(normalize_pm1(x)), [-1, 0, 1])


def test_grid_patches_match_reference_indexing():
    img = _rand(64, 64, seed=8)
    p = np.asarray(extract_grid_patches(jnp.asarray(img), 8))
    assert p.shape == (64, 8, 8)
    # reference loop (train-gray-patch.lua:267-274), 0-indexed: patch i covers
    # rows [ (i//8)*8, +8 ), cols [ (i%8)*8, +8 )
    for i in [0, 1, 7, 8, 9, 63]:
        r, c = (i // 8) * 8, (i % 8) * 8
        np.testing.assert_allclose(p[i], img[r:r + 8, c:c + 8])
    back = np.asarray(reassemble_grid_patches(jnp.asarray(p), 64, 64))
    np.testing.assert_allclose(back, img)


def test_overlap_patches_match_reference_indexing():
    img = _rand(64, 64, seed=9)
    line, n = overlap_grid(64, 8, 4)
    assert (line, n) == (15, 225)
    p = np.asarray(extract_overlap_patches(jnp.asarray(img), 8, 4))
    assert p.shape == (225, 8, 8)
    # reference (overlap:393-399): patch i at rows x*4, cols y*4 (x=i//15, y=i%15)
    for i in [0, 1, 14, 15, 16, 224]:
        x, y = i // 15, i % 15
        np.testing.assert_allclose(p[i], img[4 * x:4 * x + 8, 4 * y:4 * y + 8])


def test_stitch_overlap_naive_matches_reference_loop():
    rng = np.random.RandomState(10)
    patches = rng.rand(225, 8, 8).astype(np.float32)
    got = np.asarray(stitch_overlap_naive(jnp.asarray(patches), 64, 8, 4))
    # replay the reference's last-writer-wins loop (overlap:434-447)
    want = np.zeros((64, 64), np.float32)
    for i in range(225):
        x, y = i // 15, i % 15
        want[4 * x:4 * x + 8, 4 * y:4 * y + 8] = patches[i]
    np.testing.assert_allclose(got, want)
