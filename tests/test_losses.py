"""Loss-scheme golden tests against torch criteria (nn.MSECriterion /
nn.BCECriterion are size-averaged; train.lua:142, train-gray-3.lua:101)."""

import numpy as np
import jax.numpy as jnp
import torch

from dcgan_sr_tpu.core import get_config
from dcgan_sr_tpu.losses import bce_loss, criterion, make_labels, mse_loss


def _rand(*shape, seed=0, lo=0.02, hi=0.98):
    r = np.random.RandomState(seed).rand(*shape).astype(np.float32)
    return lo + r * (hi - lo)


def test_mse_matches_torch_criterion():
    pred = _rand(32, seed=1, lo=-2, hi=2)
    target = _rand(32, seed=2, lo=-2, hi=2)
    ours = float(mse_loss(jnp.asarray(pred), jnp.asarray(target)))
    ref = torch.nn.functional.mse_loss(torch.from_numpy(pred),
                                       torch.from_numpy(target)).item()
    np.testing.assert_allclose(ours, ref, rtol=1e-6)


def test_bce_matches_torch_criterion():
    pred = _rand(64, seed=3)
    target = (np.random.RandomState(4).rand(64) > 0.5).astype(np.float32)
    ours = float(bce_loss(jnp.asarray(pred), jnp.asarray(target)))
    ref = torch.nn.functional.binary_cross_entropy(
        torch.from_numpy(pred), torch.from_numpy(target)).item()
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_label_schemes_per_variant():
    real = jnp.asarray(_rand(4, 3, 8, 8, seed=5, lo=-1, hi=1))
    fake = jnp.asarray(_rand(4, 3, 8, 8, seed=6, lo=-1, hi=1))
    per = np.asarray(((real - fake) ** 2).sum(axis=(1, 2, 3)))

    cfg = get_config("rgb-full", env_override=False)
    r, f, g = make_labels(cfg, real, fake)
    np.testing.assert_allclose(np.asarray(r), 0.0)
    np.testing.assert_allclose(np.asarray(f), per / (4 * 3 * 8 * 8), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g), 0.0)

    cfg = get_config("gray", env_override=False)
    r, f, g = make_labels(cfg, real, fake)
    np.testing.assert_allclose(np.asarray(r), 0.001)
    np.testing.assert_allclose(np.asarray(f), per / (8 * 8), rtol=1e-5)

    cfg = get_config("gray-2", env_override=False)
    r, f, g = make_labels(cfg, real, fake)
    np.testing.assert_allclose(np.asarray(g), 0.001)
    assert cfg.report_scale_real == 100000.0

    cfg = get_config("gray-3", env_override=False)
    r, f, g = make_labels(cfg, real, fake)
    np.testing.assert_allclose(np.asarray(r), 1.0)
    np.testing.assert_allclose(np.asarray(f), 0.0)
    np.testing.assert_allclose(np.asarray(g), 1.0)


def test_criterion_selector():
    assert criterion(get_config("gray-3", env_override=False)) is bce_loss
    assert criterion(get_config("rgb-full", env_override=False)) is mse_loss
