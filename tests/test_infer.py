"""Inference tests: full/grid/overlap SR paths and the seam-cut stitcher."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dcgan_sr_tpu.core import get_config
from dcgan_sr_tpu.image.patches import extract_overlap_patches
from dcgan_sr_tpu.infer import seam_stitch, sr_full_image, sr_grid_patches, sr_overlap_image
from dcgan_sr_tpu.infer.tiled import make_generator_fn
from dcgan_sr_tpu.train import init_train_state

TINY = dict(ngf=4, ndf=8)


def _setup(variant):
    cfg = get_config(variant, env_override=False, **TINY)
    state = init_train_state(cfg, jax.random.PRNGKey(0))
    gen = make_generator_fn(cfg)
    return cfg, state, gen


def test_sr_full_image():
    cfg, state, gen = _setup("gray-3")
    img = jnp.asarray(np.random.RandomState(0).rand(64, 64), np.float32)
    fake, lr = sr_full_image(cfg, gen, state.g_params, state.g_state, img)
    assert fake.shape == (64, 64)
    assert lr.shape == (32, 32)


def test_sr_grid_patches():
    cfg, state, gen = _setup("gray-patch")
    img = jnp.asarray(np.random.RandomState(1).rand(64, 64), np.float32)
    out = sr_grid_patches(cfg, gen, state.g_params, state.g_state, img)
    assert out.shape == (64, 64)


def test_sr_overlap_image():
    cfg, state, gen = _setup("gray-patch-batch-overlap")
    img = jnp.asarray(np.random.RandomState(2).rand(64, 64), np.float32)
    res = sr_overlap_image(cfg, gen, state.g_params, state.g_state, img)
    assert res["tiles"].shape == (225, 8, 8)
    assert res["naive"].shape == (64, 64)
    assert res["seam"].shape == (64, 64)


def test_seam_stitch_identical_patches_is_exact():
    """If every tile agrees with its neighbors, seam == naive == truth."""
    img = np.random.RandomState(3).rand(64, 64).astype(np.float32)
    tiles = np.asarray(extract_overlap_patches(jnp.asarray(img), 8, 4))
    out = seam_stitch(tiles, 64, 8, 4)
    np.testing.assert_allclose(out, img, rtol=0, atol=0)


def test_seam_stitch_values_come_from_tiles():
    """Every output pixel must equal some covering tile's pixel (compositing
    only selects, never blends)."""
    rng = np.random.RandomState(4)
    tiles = rng.rand(225, 8, 8).astype(np.float32)
    out = seam_stitch(tiles, 64, 8, 4)
    line = 15
    ok = np.zeros((64, 64), bool)
    for i in range(225):
        x, y = i // line, i % line
        r0, c0 = 4 * x, 4 * y
        ok[r0:r0 + 8, c0:c0 + 8] |= (
            out[r0:r0 + 8, c0:c0 + 8] == tiles[i])
    assert ok.all()


def test_seam_stitch_matches_reference_loop_small_case():
    """Hand-replayed reference DP on a 2-patch case (row 1, left seam).

    patch=4, overlap=2, fine=6 -> line=2, 4 patches; check patch (0,1):
    its left band is compared to patch (0,0)'s right band.
    """
    patch, ov, fine = 4, 2, 6
    rng = np.random.RandomState(5)
    tiles = rng.rand(4, patch, patch).astype(np.float32)
    out = seam_stitch(tiles, fine, patch, ov)

    # replicate the reference loops for patch i=1 (x=0, y=1)
    prev, cur = tiles[0], tiles[1]
    delta = np.abs(prev[:, patch - ov:] - cur[:, :ov])
    path = np.zeros_like(delta)
    path[0] = delta[0]
    for a in range(1, patch):
        for b in range(ov):
            lo, hi = max(b - 1, 0), min(b + 1, ov - 1)
            path[a, b] = delta[a, b] + path[a - 1, lo:hi + 1].min()
    # last row: LAST argmin
    idx = np.zeros(patch, int)
    mn = path[-1].min()
    for b in range(ov):
        if path[-1, b] == mn:
            idx[-1] = b + 1
    for a in range(patch - 2, -1, -1):
        nb = idx[a + 1]
        if nb == 1:
            idx[a] = 1 if path[a, 0] == min(path[a, 0], path[a, 1]) else 2
        elif nb == ov:
            idx[a] = ov if path[a, ov - 1] == min(path[a, ov - 1], path[a, ov - 2]) else ov - 1
        else:  # pragma: no cover - ov=2 has no interior
            raise AssertionError
    want_row = np.zeros((patch, patch), np.float32)
    for a in range(patch):
        k = idx[a]
        want_row[a, :k] = prev[a, patch - ov:patch - ov + k]
        want_row[a, k:] = cur[a, k:]
    # rows >= ov are later overwritten by the second patch row; only the
    # surviving rows of the composite are comparable
    np.testing.assert_allclose(out[0:ov, ov:ov + patch], want_row[0:ov])


def test_polarity_rescue():
    from dcgan_sr_tpu.evaluation import polarity_rescue
    real = np.full((8, 8), 0.9, np.float32)
    fake = np.full((8, 8), 0.1, np.float32)  # inverted-looking, PSNR ~ 2 dB
    img, psnr, inverted = polarity_rescue(real, fake)
    assert inverted
    assert psnr > 20  # 1-0.1=0.9 matches exactly


def test_evaluate_slice_synthetic():
    from dcgan_sr_tpu.data import SyntheticImages
    from dcgan_sr_tpu.evaluation import evaluate_slice
    cfg, state, gen = _setup("gray-3")
    src = SyntheticImages(fine_size=64, nc=1, seed=1)
    res = evaluate_slice(cfg, gen, state.g_params, state.g_state, src,
                         range(1), batch_size=4)
    assert res.n_images == 4
    assert 0 < res.psnr_bilinear < 99
    assert -1 <= res.ssim_bilinear <= 1


def test_evaluate_slice_uses_provided_gen_fn():
    """A custom gen_fn must actually be scored (round-1 had a dead param):
    a generator that returns the bilinear upscale makes psnr_generator equal
    psnr_bilinear exactly."""
    from dcgan_sr_tpu.core import get_config
    from dcgan_sr_tpu.data import SyntheticImages
    from dcgan_sr_tpu.evaluation import evaluate_slice
    from dcgan_sr_tpu.image.ops import resize_bilinear

    cfg = get_config("gray-3", env_override=False, ngf=4, ndf=8, batchSize=4)
    src = SyntheticImages(cfg.fineSize, nc=1, seed=3)

    def bilinear_gen(params, state, lr):
        return resize_bilinear(lr, cfg.fineSize, cfg.fineSize)

    res = evaluate_slice(cfg, bilinear_gen, None, None, src, range(1),
                         with_ssim=False)
    assert res.psnr_generator == res.psnr_bilinear
    # and a genuinely different generator must NOT collapse to the control
    def zero_gen(params, state, lr):
        import jax.numpy as jnp
        return jnp.zeros(lr.shape[:2] + (cfg.fineSize, cfg.fineSize),
                         lr.dtype)

    res2 = evaluate_slice(cfg, zero_gen, None, None, src, range(1),
                          with_ssim=False)
    assert res2.psnr_generator != res2.psnr_bilinear
