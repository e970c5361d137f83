"""Device (lax.scan, batched) seam stitcher == host reference implementation."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dcgan_sr_tpu.infer.seam import seam_stitch
from dcgan_sr_tpu.infer.seam_device import seam_stitch_device


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_device_matches_host_random(seed):
    tiles = np.random.RandomState(seed).rand(225, 8, 8).astype(np.float32)
    host = seam_stitch(tiles, 64, 8, 4)
    dev = np.asarray(seam_stitch_device(jnp.asarray(tiles), 64, 8, 4))
    np.testing.assert_array_equal(dev, host)


def test_device_matches_host_with_ties():
    """Quantized tiles force DP ties — tie-breaking must match exactly."""
    rng = np.random.RandomState(3)
    tiles = (rng.randint(0, 4, (225, 8, 8)) / 4.0).astype(np.float32)
    host = seam_stitch(tiles, 64, 8, 4)
    dev = np.asarray(seam_stitch_device(jnp.asarray(tiles), 64, 8, 4))
    np.testing.assert_array_equal(dev, host)


def test_device_identity_when_tiles_agree():
    img = np.random.RandomState(4).rand(64, 64).astype(np.float32)
    from dcgan_sr_tpu.image.patches import extract_overlap_patches
    tiles = extract_overlap_patches(jnp.asarray(img), 8, 4)
    out = np.asarray(seam_stitch_device(tiles, 64, 8, 4))
    np.testing.assert_allclose(out, img, rtol=0, atol=0)


def test_device_jits():
    tiles = jnp.asarray(np.random.RandomState(5).rand(225, 8, 8), jnp.float32)
    f = jax.jit(lambda t: seam_stitch_device(t, 64, 8, 4))
    out = f(tiles)
    assert out.shape == (64, 64)
    np.testing.assert_array_equal(np.asarray(out),
                                  seam_stitch(np.asarray(tiles), 64, 8, 4))


def test_other_geometry():
    """patch=4, overlap=2, fine=10 -> line=4, 16 tiles."""
    tiles = np.random.RandomState(6).rand(16, 4, 4).astype(np.float32)
    host = seam_stitch(tiles, 10, 4, 2)
    dev = np.asarray(seam_stitch_device(jnp.asarray(tiles), 10, 4, 2))
    np.testing.assert_array_equal(dev, host)
