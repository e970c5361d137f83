"""The committed gray-patch fixture beats bilinear on a held-out set.

Fixture: epoch 35 of a 90-epoch textured-protocol run (`--pixel-loss 1000`),
selected on the TRAIN slice (tools/select_checkpoint.py; GAN training
oscillates — never take the last epoch) and scored once here on the held-out
slice: +1.40 dB over bilinear at batch 50, +1.92 dB on this 16-image probe
(raw branch; the EMA branch scored 0.4 dB lower and is not used). Exercises
the 1-image/64-patch variant's tile-reassembly eval path
(train-gray-patch.lua:21,94-109).
"""

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
FIXTURE = os.path.join(REPO, "fixtures", "graypatch_textured_net_G.npz")


@pytest.mark.skipif(not os.path.isfile(FIXTURE), reason="fixture not committed")
def test_graypatch_fixture_beats_bilinear_heldout():
    cfg = get_config("gray-patch", env_override=False)
    data = np.load(FIXTURE)
    template = init_train_state(cfg, jax.random.PRNGKey(0))
    params = load_branch(data, "params", template.g_params)
    state = load_branch(data, "state", template.g_state)

    src = TexturedImages(cfg.fineSize, nc=1, seed=1234)
    r = evaluate_slice(cfg, None, params, state, src, [20000], batch_size=16)
    assert r.psnr_generator > r.psnr_bilinear + 1.0, (
        r.psnr_generator, r.psnr_bilinear)
    assert r.ssim_generator > r.ssim_bilinear
