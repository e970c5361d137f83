"""The committed gray-2 fixture (epoch 249 of the extended 250-epoch run,
train-slice selected) beats bilinear on a held-out set — the
3x-nearest-upsample G variant's recorded quality claim (PARITY.md: +2.53 dB
over the full 2,100-image slice)."""

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
FIXTURE = os.path.join(REPO, "fixtures", "gray2_textured_net_G.npz")



@pytest.mark.skipif(not os.path.isfile(FIXTURE), reason="fixture not committed")
def test_gray2_fixture_beats_bilinear_heldout():
    cfg = get_config("gray-2", env_override=False)
    data = np.load(FIXTURE)
    template = init_train_state(cfg, jax.random.PRNGKey(0))
    params = load_branch(data, "params", template.g_params)
    state = load_branch(data, "state", template.g_state)

    src = TexturedImages(cfg.fineSize, nc=1, seed=1234)
    r = evaluate_slice(cfg, None, params, state, src, [2001], batch_size=100)
    assert r.psnr_generator > r.psnr_bilinear + 1.5, (
        r.psnr_generator, r.psnr_bilinear)
