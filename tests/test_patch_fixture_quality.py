"""The committed patch-batch fixture checkpoint beats the bilinear control
through the full per-tile eval + reassembly protocol (one 100-image held-out
set of the 500/500 protocol, train-gray-patch-batch.lua:487-489).

Fixture: fixtures/gpb_textured_net_G.npz — epoch 63 of a 100-epoch textured
run, selected on the TRAIN slice by tools/select_checkpoint.py (PARITY.md);
full-protocol margin +2.97 dB on the 500-image test slice."""

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
FIXTURE = os.path.join(REPO, "fixtures", "gpb_textured_net_G.npz")



@pytest.mark.skipif(not os.path.isfile(FIXTURE), reason="fixture not committed")
def test_patch_fixture_beats_bilinear_heldout():
    cfg = get_config("gray-patch-batch", env_override=False)
    src = TexturedImages(cfg.fineSize, nc=1, seed=1234)
    template = init_train_state(cfg, jax.random.PRNGKey(0))

    data = np.load(FIXTURE)
    params = load_branch(data, "params", template.g_params)
    state = load_branch(data, "state", template.g_state)

    r = evaluate_slice(cfg, None, params, state, src, [20000], batch_size=50)
    assert r.psnr_generator > r.psnr_bilinear + 2.0, (
        r.psnr_generator, r.psnr_bilinear)
    assert r.ssim_generator > r.ssim_bilinear
