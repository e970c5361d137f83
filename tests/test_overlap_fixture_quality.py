"""The trained overlap-variant fixture: seam-cut stitching beats BOTH the
naive stitch and the bilinear control on held-out data (running-stats BN).

This is the reference's design intent for its 7th script measured end to end
(train-gray-patch-batch-overlap.lua:457-694): the minimum-error-boundary DP
exists precisely to beat last-writer-wins stitching. Full 500-image protocol
numbers in PARITY.md (+1.53 dB over bilinear, +0.43 dB over naive)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dcgan_sr_tpu.core import get_config
from dcgan_sr_tpu.data.synthetic import TexturedImages
from dcgan_sr_tpu.image.ops import box_downsample2, resize_bilinear
from dcgan_sr_tpu.infer.tiled import make_overlap_sr_fn
from dcgan_sr_tpu.metrics import cal_psnr_batch
from dcgan_sr_tpu.train import init_train_state
from dcgan_sr_tpu.train.checkpoint import load_branch

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURE = os.path.join(REPO, "fixtures", "overlap_textured_net_G.npz")



@pytest.mark.skipif(not os.path.isfile(FIXTURE), reason="fixture not committed")
def test_seam_beats_naive_beats_bilinear_heldout():
    cfg = get_config("gray-patch-batch-overlap", env_override=False)
    data = np.load(FIXTURE)
    template = init_train_state(cfg, jax.random.PRNGKey(0))
    params = load_branch(data, "params", template.g_params)
    g_state = load_branch(data, "state", template.g_state)

    src = TexturedImages(cfg.fineSize, nc=1, seed=1234)
    hr = jnp.asarray(src.load_batch(62500, 16))[:, 0]  # held-out slice

    out = make_overlap_sr_fn(cfg, bn_eval=True)(params, g_state, hr)
    bil = resize_bilinear(box_downsample2(hr), cfg.fineSize, cfg.fineSize)
    p_bil = float(cal_psnr_batch(hr, bil).mean())
    p_naive = float(cal_psnr_batch(hr, out["naive"]).mean())
    p_seam = float(cal_psnr_batch(hr, out["seam"]).mean())

    assert p_naive > p_bil + 0.5, (p_naive, p_bil)
    assert p_seam > p_naive + 0.2, (p_seam, p_naive)


@pytest.mark.skipif(not os.path.isfile(FIXTURE), reason="fixture not committed")
def test_evaluate_overlap_slice_cli_path():
    """The CLI's `--eval` path for the overlap variant: evaluate_overlap_slice
    scores bilinear / naive / seam through the tiled pipeline (the variant's
    defining comparison, overlap:423-424,453-454,703-704)."""
    from dcgan_sr_tpu.evaluation import evaluate_overlap_slice

    cfg = get_config("gray-patch-batch-overlap", env_override=False)
    data = np.load(FIXTURE)
    template = init_train_state(cfg, jax.random.PRNGKey(0))
    params = load_branch(data, "params", template.g_params)
    g_state = load_branch(data, "state", template.g_state)

    src = TexturedImages(cfg.fineSize, nc=1, seed=1234)
    res = evaluate_overlap_slice(cfg, params, g_state, src, [62500],
                                 batch_size=16, bn_eval=True)
    assert res.n_images == 16
    # same ordering as the stitch test: seam > naive > bilinear, SSIM finite
    assert res.psnr_naive > res.psnr_bilinear + 0.5
    assert res.psnr_seam > res.psnr_naive + 0.2
    assert 0.5 < res.ssim_seam <= 1.0
    lines = []
    res.print_reference_style("Test-set", log_fn=lines.append)
    assert any("fake_none_overlap" in ln for ln in lines)
