"""Train-step parity for the ERROR-REGRESSION scheme (rgb-full / train.lua)
against a torch-CPU replica — the scheme SURVEY.md §7.4 flags as easiest to
silently diverge (real->0, fake->per-image quarter-MSE as D's target, G->0,
MSE criterion, data in [-1,1])."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn as nn

from dcgan_sr_tpu.core import get_config
from dcgan_sr_tpu.models import init_network, discriminator_spec, generator_spec
from dcgan_sr_tpu.ops.adam import adam_init
from dcgan_sr_tpu.train import build_train_step
from dcgan_sr_tpu.train.step import TrainState

NGF, NDF, B = 4, 8, 6


def _torch_models(g_params, d_params):
    g = nn.Sequential(  # train.lua:97-113
        nn.ConvTranspose2d(3, NGF * 8, 4, 2, 1, bias=False),
        nn.BatchNorm2d(NGF * 8), nn.ReLU(),
        nn.ConvTranspose2d(NGF * 8, NGF * 4, 4, 2, 1, bias=False),
        nn.BatchNorm2d(NGF * 4), nn.ReLU(),
        nn.ConvTranspose2d(NGF * 4, NGF * 2, 4, 2, 1, bias=False),
        nn.BatchNorm2d(NGF * 2), nn.ReLU(),
        nn.Conv2d(NGF * 2, NGF, 4, 2, 1, bias=False),
        nn.BatchNorm2d(NGF), nn.LeakyReLU(0.2),
        nn.Conv2d(NGF, 3, 4, 2, 1, bias=False), nn.Tanh(),
    )
    d = nn.Sequential(  # train.lua:119-137
        nn.Conv2d(3, NDF, 4, 2, 1, bias=False), nn.LeakyReLU(0.2),
        nn.Conv2d(NDF, NDF * 2, 4, 2, 1, bias=False),
        nn.BatchNorm2d(NDF * 2), nn.LeakyReLU(0.2),
        nn.Conv2d(NDF * 2, NDF * 4, 4, 2, 1, bias=False),
        nn.BatchNorm2d(NDF * 4), nn.LeakyReLU(0.2),
        nn.Conv2d(NDF * 4, NDF * 8, 4, 2, 1, bias=False),
        nn.BatchNorm2d(NDF * 8), nn.LeakyReLU(0.2),
        nn.Conv2d(NDF * 8, 1, 4, 1, 0, bias=False), nn.Sigmoid(),
        nn.Flatten(0),
    )

    def load(seq, params):
        mods = [m for m in seq if isinstance(
            m, (nn.Conv2d, nn.ConvTranspose2d, nn.BatchNorm2d))]
        i = 0
        for p in params:
            if not p:
                continue
            mods[i].weight.data = torch.from_numpy(np.asarray(p["w"]).copy())
            i += 1
            if "bn_scale" in p:
                mods[i].weight.data = torch.from_numpy(
                    np.asarray(p["bn_scale"]).copy())
                mods[i].bias.data = torch.from_numpy(
                    np.asarray(p["bn_bias"]).copy())
                i += 1

    load(g, g_params)
    load(d, d_params)
    g.train()
    d.train()
    return g, d


def test_error_regression_step_matches_torch():
    cfg = get_config("rgb-full", env_override=False, ngf=NGF, ndf=NDF)
    g_spec, d_spec = generator_spec(cfg), discriminator_spec(cfg)
    g_params, g_state = init_network(jax.random.PRNGKey(0), g_spec)
    d_params, d_state = init_network(jax.random.PRNGKey(1), d_spec)
    state = TrainState(g_params=g_params, g_state=g_state,
                       g_opt=adam_init(g_params),
                       d_params=d_params, d_state=d_state,
                       d_opt=adam_init(d_params))
    step = jax.jit(build_train_step(cfg))

    g_t, d_t = _torch_models(g_params, d_params)
    crit = nn.MSELoss()

    hr_np = (np.random.RandomState(5).rand(B, 3, 64, 64) * 2 - 1).astype(
        np.float32)
    _, m = step(state, jnp.asarray(hr_np))

    # --- torch replica of fDx (train.lua:208-253) and fGx (:256-272) -------
    hr = torch.from_numpy(hr_np)
    out_real = d_t(hr)
    err_real = crit(out_real, torch.zeros(B))  # real label 0 (train.lua:219)

    lr_img = hr.reshape(B, 3, 32, 2, 32, 2).mean(dim=(3, 5))
    with torch.no_grad():
        fake = g_t(lr_img)
    # per-image quarter-MSE fake labels (train.lua:193-195,237-239)
    per = ((hr - fake) ** 2).sum(dim=(1, 2, 3)) / (4 * 3 * 64 * 64)
    out_fake = d_t(fake)
    err_fake = crit(out_fake, per)

    # fGx: same D output vs target 0 (train.lua:264-266)
    err_g = crit(out_fake, torch.zeros(B))

    np.testing.assert_allclose(float(m["errD_real"]), float(err_real),
                               rtol=2e-3, atol=1e-5)
    np.testing.assert_allclose(float(m["errD_fake"]), float(err_fake),
                               rtol=2e-3, atol=1e-5)
    np.testing.assert_allclose(float(m["errG"]), float(err_g),
                               rtol=2e-3, atol=1e-5)
