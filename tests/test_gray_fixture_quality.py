"""The committed gray fixture (EMA branch, last epoch of the 100-epoch run)
beats bilinear on a held-out set — the BN-free G variant's recorded quality
claim (PARITY.md: +0.53 dB over the full 2,100-image slice; the weakest
variant, matching the reference's own progression — its curve plateaus from
~epoch 25, measured round 3). Exercises the no-BN pm1 eval path and the EMA
branch loader."""

import os

import numpy as np
import jax
import pytest

from dcgan_sr_tpu.core import get_config
from dcgan_sr_tpu.data.synthetic import TexturedImages
from dcgan_sr_tpu.evaluation.harness import evaluate_slice
from dcgan_sr_tpu.train import init_train_state
from dcgan_sr_tpu.train.checkpoint import load_branch

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURE = os.path.join(REPO, "fixtures", "gray_textured_net_G.npz")


@pytest.mark.skipif(not os.path.isfile(FIXTURE), reason="fixture not committed")
def test_gray_fixture_beats_bilinear_heldout():
    cfg = get_config("gray", env_override=False)
    data = np.load(FIXTURE)
    template = init_train_state(cfg, jax.random.PRNGKey(0))
    params = load_branch(data, "ema", template.g_params)
    state = load_branch(data, "state", template.g_state)

    src = TexturedImages(cfg.fineSize, nc=1, seed=1234)
    r = evaluate_slice(cfg, None, params, state, src, [2001], batch_size=100)
    assert r.psnr_generator > r.psnr_bilinear + 0.2, (
        r.psnr_generator, r.psnr_bilinear)
    assert r.ssim_generator > r.ssim_bilinear
