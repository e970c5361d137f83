"""Default-tier torch-golden train-step parity (trimmed to ONE step).

The full 2-step chains live in test_step_parity_torch{,_mse}.py (@slow);
this keeps the strongest semantics check — our fused jitted step vs a
torch-CPU replica of the reference computation (fDx + fGx + torch7 adam,
train-gray-3.lua:229-328) — in every default `pytest tests/ -q` run:
losses AND one updated conv layer's weights after one optimizer step.
"""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn as nn

from dcgan_sr_tpu.core import get_config
from dcgan_sr_tpu.models import discriminator_spec, generator_spec, init_network
from dcgan_sr_tpu.ops.adam import adam_init
from dcgan_sr_tpu.train import build_train_step
from dcgan_sr_tpu.train.step import TrainState

from test_step_parity_torch import (B, NDF, NGF, Torch7Adam,
                                    _build_torch_gray3,
                                    _torch_reference_step)


def test_one_step_matches_torch_reference():
    cfg = get_config("gray-3", env_override=False, ngf=NGF, ndf=NDF)
    g_spec, d_spec = generator_spec(cfg), discriminator_spec(cfg)
    g_params, g_state = init_network(jax.random.PRNGKey(0), g_spec)
    d_params, d_state = init_network(jax.random.PRNGKey(1), d_spec)
    state = TrainState(g_params=g_params, g_state=g_state,
                       g_opt=adam_init(g_params),
                       d_params=d_params, d_state=d_state,
                       d_opt=adam_init(d_params))
    step = jax.jit(build_train_step(cfg))

    g_t, d_t = _build_torch_gray3(g_params, d_params)
    optG = Torch7Adam(g_t.parameters())
    optD = Torch7Adam(d_t.parameters())

    hr_np = np.random.RandomState(7).rand(B, 1, 64, 64).astype(np.float32)
    state, m = step(state, jnp.asarray(hr_np))
    err_d_t, err_g_t = _torch_reference_step(
        g_t, d_t, optG, optD, torch.from_numpy(hr_np), nn.BCELoss())

    np.testing.assert_allclose(float(m["errD"]), err_d_t, rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(float(m["errG"]), err_g_t, rtol=2e-3, atol=2e-4)

    # first G conv layer's UPDATED weights: the whole chain (BN batch stats,
    # loss reductions, gradient flow, torch7-adam step) must agree.  Adam's
    # first step is ~±lr·sign(g): allow isolated sign flips on near-zero
    # gradient elements, demand the rest tight (same bound rationale as the
    # 2-step version).
    t_conv = next(mm for mm in g_t
                  if isinstance(mm, (nn.Conv2d, nn.ConvTranspose2d)))
    our_w = next(p["w"] for p in state.g_params if p)
    before = next(p["w"] for p in g_params if p)
    assert float(np.abs(np.asarray(our_w) - np.asarray(before)).max()) > 0.0
    diff = np.abs(np.asarray(our_w) - t_conv.weight.detach().numpy())
    assert diff.max() < 2.1 * cfg.lr, f"max {diff.max()}"
    n_off = int((diff > 5e-5).sum())
    assert n_off <= max(8, 0.05 * diff.size), f"{n_off}/{diff.size} off"
