"""The committed rgb-full fixture (epoch 400, EMA branch promoted into
`params`, tail-ranked on the train slice) beats bilinear on a held-out set —
the best-scoring variant (+6.27 dB over the full test slice; 34.814 dB /
+6.36 on this held-out regression set, PARITY.md). Exercises the
multi-channel + pm1 eval path."""

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
FIXTURE = os.path.join(REPO, "fixtures", "rgb_textured_net_G.npz")



@pytest.mark.skipif(not os.path.isfile(FIXTURE), reason="fixture not committed")
def test_rgb_fixture_beats_bilinear_heldout():
    cfg = get_config("rgb-full", env_override=False)
    data = np.load(FIXTURE)
    template = init_train_state(cfg, jax.random.PRNGKey(0))
    params = load_branch(data, "params", template.g_params)
    state = load_branch(data, "state", template.g_state)

    src = TexturedImages(cfg.fineSize, nc=3, seed=1234)
    r = evaluate_slice(cfg, None, params, state, src, [4002], batch_size=50)
    assert r.psnr_generator > r.psnr_bilinear + 3.5, (
        r.psnr_generator, r.psnr_bilinear)
    assert r.ssim_generator > r.ssim_bilinear
