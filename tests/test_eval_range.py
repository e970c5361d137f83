"""Range-correctness invariant of the eval harness: a 'generator' that just
bilinear-upscales its input must score EXACTLY the bilinear control, in every
data range and channel count. (Round-2 regression: the harness fed [0,1]
inputs to pm1-trained generators, understating gray by 4 dB — this invariant
fails loudly on any such range mismatch.)"""

import numpy as np
import jax
import pytest

from dcgan_sr_tpu.core import get_config
from dcgan_sr_tpu.data.synthetic import TexturedImages
from dcgan_sr_tpu.evaluation.harness import evaluate_slice
from dcgan_sr_tpu.image.ops import resize_bilinear


@pytest.mark.parametrize("variant,nc", [
    ("gray-3", 1),      # data_range 01
    ("gray", 1),        # pm1
    ("rgb-full", 3),    # pm1, multi-channel
])
def test_bilinear_generator_scores_as_control(variant, nc):
    cfg = get_config(variant, env_override=False, ngf=4, ndf=8)
    src = TexturedImages(cfg.fineSize, nc=nc, seed=1234)

    def bilinear_gen(params, state, lr):
        # receives whatever the harness feeds the generator; upsampling it
        # must reproduce the control EXACTLY if (and only if) the harness is
        # range-consistent end to end
        return resize_bilinear(lr, cfg.fineSize, cfg.fineSize)

    r = evaluate_slice(cfg, bilinear_gen, None, None, src, [0], batch_size=8)
    np.testing.assert_allclose(r.psnr_generator, r.psnr_bilinear, rtol=1e-6)
    np.testing.assert_allclose(r.ssim_generator, r.ssim_bilinear, rtol=1e-6)
    assert r.psnr_bilinear > 20.0  # sane control on textured data


def test_short_final_batch_does_not_skew_means():
    """A loader returning a short last batch must be averaged by the ACTUAL
    row count, not the requested batch_size (round-3 verdict: harness.py
    accrued n += batch_size and silently skewed slice means)."""
    cfg = get_config("gray-3", env_override=False, ngf=4, ndf=8)
    full = TexturedImages(cfg.fineSize, nc=1, seed=1234)

    class ShortLast:
        def load_batch(self, fs, batch_size):
            b = full.load_batch(fs, batch_size)
            return b[:3] if fs == 1 else b  # 8 + 3 rows, not 8 + 8

    def bilinear_gen(params, state, lr):
        return resize_bilinear(lr, cfg.fineSize, cfg.fineSize)

    r = evaluate_slice(cfg, bilinear_gen, None, None, ShortLast(), [0, 1],
                       batch_size=8)
    assert r.n_images == 11
    # mean over the true 11 rows == manual recombination of the two batches
    r0 = evaluate_slice(cfg, bilinear_gen, None, None, ShortLast(), [0],
                        batch_size=8)
    r1 = evaluate_slice(cfg, bilinear_gen, None, None, ShortLast(), [1],
                        batch_size=8)
    want = (r0.psnr_bilinear * 8 + r1.psnr_bilinear * 3) / 11
    np.testing.assert_allclose(r.psnr_bilinear, want, rtol=1e-6)


def test_overlap_slice_default_batch_is_cfg_batch():
    """evaluate_overlap_slice's default batch must be cfg.batchSize: the
    reference addresses files as file_set * batchSize + k (overlap:247), so
    file_set 10000 only names the held-out images 200,001+ at the overlap
    variant's batchSize 20 (train-gray-patch-batch.lua:489). A batch-100
    default silently aimed the CLI's test slice at images 1,000,001+ —
    beyond CelebA's 202,599 files."""
    from dcgan_sr_tpu.evaluation.harness import evaluate_overlap_slice

    cfg = get_config("gray-patch-batch-overlap", env_override=False)
    calls = []

    class Loader:
        def load_batch(self, fs, batch_size):
            calls.append((fs, batch_size))
            return np.random.RandomState(fs).rand(
                batch_size, 1, cfg.fineSize, cfg.fineSize).astype(np.float32)

    def sr_stub(params, state, hr):
        return {"naive": hr, "seam": hr}

    res = evaluate_overlap_slice(cfg, None, None, Loader(), [10000],
                                 sr_fn=sr_stub)
    assert calls == [(10000, cfg.batchSize)] and cfg.batchSize == 20
    assert res.n_images == 20
    # identity 'SR' scores PSNR 99 (the MSE=0 clamp) for naive and seam
    assert res.psnr_naive == pytest.approx(99.0)
    assert res.psnr_seam == pytest.approx(99.0)
    assert res.psnr_bilinear < 99.0
