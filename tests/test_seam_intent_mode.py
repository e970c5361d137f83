"""The both_seams intent mode (top+left composites for interior patches)."""

import numpy as np
import jax.numpy as jnp

from dcgan_sr_tpu.image.patches import extract_overlap_patches
from dcgan_sr_tpu.infer.seam import seam_stitch


def test_both_seams_exact_when_tiles_agree():
    img = np.random.RandomState(0).rand(64, 64).astype(np.float32)
    tiles = np.asarray(extract_overlap_patches(jnp.asarray(img), 8, 4))
    out = seam_stitch(tiles, 64, 8, 4, both_seams=True)
    np.testing.assert_allclose(out, img, rtol=0, atol=0)


def test_both_seams_differs_from_committed_on_disagreeing_tiles():
    tiles = np.random.RandomState(1).rand(225, 8, 8).astype(np.float32)
    committed = seam_stitch(tiles, 64, 8, 4, both_seams=False)
    intent = seam_stitch(tiles, 64, 8, 4, both_seams=True)
    # interior patches keep their top-seam composite outside the left band
    assert not np.array_equal(committed, intent)
    # first row and first column are identical in both modes
    np.testing.assert_array_equal(committed[:4], intent[:4])
    np.testing.assert_array_equal(committed[:, :4], intent[:, :4])


def test_both_seams_values_come_from_tiles():
    rng = np.random.RandomState(2)
    tiles = rng.rand(225, 8, 8).astype(np.float32)
    out = seam_stitch(tiles, 64, 8, 4, both_seams=True)
    ok = np.zeros((64, 64), bool)
    for i in range(225):
        x, y = i // 15, i % 15
        r0, c0 = 4 * x, 4 * y
        ok[r0:r0 + 8, c0:c0 + 8] |= (out[r0:r0 + 8, c0:c0 + 8] == tiles[i])
    assert ok.all()
