"""Rectangular (H != W) overlap tiling: extraction, naive stitch ownership,
and host/device seam-stitch agreement — the arbitrary-size inference path
(generalizing train-gray-patch-batch-overlap.lua:387-399, which is square)."""

import numpy as np
import pytest

from dcgan_sr_tpu.image.patches import (extract_overlap_patches,
                                        stitch_overlap_naive)
from dcgan_sr_tpu.infer.seam import seam_stitch
from dcgan_sr_tpu.infer.seam_device import seam_stitch_device

P, OV = 8, 4


def _brute_naive(tiles, fh, fw):
    """Replay the reference's last-writer-wins writes literally."""
    lh = (fh - OV) // (P - OV)
    lw = (fw - OV) // (P - OV)
    out = np.zeros((fh, fw), np.float32)
    for i in range(lh * lw):
        x, y = i // lw, i % lw
        out[x * OV:x * OV + P, y * OV:y * OV + P] = tiles[i]
    return out


@pytest.mark.parametrize("fh,fw", [(36, 24), (24, 36), (64, 32), (32, 64)])
def test_rect_extract_and_naive_stitch(fh, fw):
    rng = np.random.RandomState(0)
    img = rng.rand(fh, fw).astype(np.float32)
    tiles = np.asarray(extract_overlap_patches(img, P, OV))
    lh = (fh - OV) // (P - OV)
    lw = (fw - OV) // (P - OV)
    assert tiles.shape == (lh * lw, P, P)
    # tile i covers rows [x*OV, x*OV+P), cols [y*OV, y*OV+P)
    for i in (0, lw - 1, lw, lh * lw - 1):
        x, y = i // lw, i % lw
        np.testing.assert_array_equal(
            tiles[i], img[x * OV:x * OV + P, y * OV:y * OV + P])
    out = np.asarray(stitch_overlap_naive(tiles, (fh, fw), P, OV))
    np.testing.assert_array_equal(out, _brute_naive(tiles, fh, fw))
    # exact tiles reproduce the original image exactly
    np.testing.assert_array_equal(out, img)


@pytest.mark.parametrize("fh,fw", [(36, 24), (24, 36)])
def test_rect_seam_host_device_identical(fh, fw):
    rng = np.random.RandomState(1)
    lh = (fh - OV) // (P - OV)
    lw = (fw - OV) // (P - OV)
    tiles = rng.rand(lh * lw, P, P).astype(np.float32)
    host = seam_stitch(tiles, (fh, fw), P, OV)
    dev = np.asarray(seam_stitch_device(tiles, (fh, fw), P, OV))
    np.testing.assert_array_equal(host, dev)
    assert host.shape == (fh, fw)


def test_square_still_matches_int_fine():
    """(fine, fine) tuple and int fine agree (back-compat with round-1 API)."""
    rng = np.random.RandomState(2)
    tiles = rng.rand(225, P, P).astype(np.float32)
    a = seam_stitch(tiles, 64, P, OV)
    b = seam_stitch(tiles, (64, 64), P, OV)
    np.testing.assert_array_equal(a, b)
    na = np.asarray(stitch_overlap_naive(tiles, 64, P, OV))
    nb = np.asarray(stitch_overlap_naive(tiles, (64, 64), P, OV))
    np.testing.assert_array_equal(na, nb)


def test_rect_seam_identity_on_consistent_tiles():
    """Tiles cut from one image stitch back to that image (seams are
    no-ops when overlap bands agree)."""
    rng = np.random.RandomState(3)
    img = rng.rand(24, 36).astype(np.float32)
    tiles = np.asarray(extract_overlap_patches(img, P, OV))
    out = seam_stitch(tiles, (24, 36), P, OV)
    np.testing.assert_allclose(out, img, atol=0)


def test_overlap_pad_dim_legal_geometries_terminate_even_and_minimal():
    from dcgan_sr_tpu.infer.tiled import overlap_pad_dim
    for patch, ov in [(8, 4), (8, 3), (9, 4), (16, 8), (7, 2)]:
        q = patch - ov
        for d in range(1, 70):
            d2 = overlap_pad_dim(d, patch, ov)
            assert d2 >= max(d, patch)
            assert (d2 - ov) % q == 0 and d2 % 2 == 0
            # minimality: no smaller extent satisfies both constraints
            for c in range(max(d, patch), d2):
                assert (c - ov) % q != 0 or c % 2 != 0


def test_overlap_pad_dim_odd_overlap_even_stride_raises():
    # q = patch - overlap even with overlap odd pins every legal extent to
    # odd parity; the former implementation looped forever here (ADVICE r2).
    from dcgan_sr_tpu.infer.tiled import overlap_pad_dim
    with pytest.raises(ValueError, match="unsatisfiable"):
        overlap_pad_dim(30, 9, 5)
