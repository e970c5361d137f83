"""Shape/topology tests for all seven variants' G/D (SURVEY.md §2.1 table)."""

import jax
import jax.numpy as jnp
import pytest

from dcgan_sr_tpu.core import get_config
from dcgan_sr_tpu.models import (
    apply_network,
    discriminator_spec,
    generator_spec,
    init_network,
    param_count,
)

ALL = ["rgb-full", "gray", "gray-2", "gray-3", "gray-patch",
       "gray-patch-batch", "gray-patch-batch-overlap"]


@pytest.mark.parametrize("variant", ALL)
def test_generator_shape(variant):
    cfg = get_config(variant, env_override=False)
    spec = generator_spec(cfg)
    params, state = init_network(jax.random.PRNGKey(0), spec)
    hr = cfg.train_size
    x = jnp.zeros((2, cfg.nc, hr // 2, hr // 2))
    y, _ = apply_network(spec, params, x, state)
    assert y.shape == (2, cfg.nc, hr, hr)


@pytest.mark.parametrize("variant", ALL)
def test_discriminator_shape(variant):
    cfg = get_config(variant, env_override=False)
    spec = discriminator_spec(cfg)
    params, state = init_network(jax.random.PRNGKey(1), spec)
    hr = cfg.train_size
    x = jnp.zeros((3, cfg.nc, hr, hr))
    y, _ = apply_network(spec, params, x, state)
    assert y.shape == (3,)


def test_generator_output_ranges():
    # tanh heads in [-1,1] (rgb-full, gray); sigmoid heads in [0,1] (rest)
    for variant, lo, hi in [("rgb-full", -1, 1), ("gray-3", 0, 1)]:
        cfg = get_config(variant, env_override=False)
        spec = generator_spec(cfg)
        params, state = init_network(jax.random.PRNGKey(2), spec)
        x = 10 * jax.random.normal(jax.random.PRNGKey(3),
                                   (2, cfg.nc, cfg.train_size // 2, cfg.train_size // 2))
        y, _ = apply_network(spec, params, x, state)
        assert float(y.min()) >= lo and float(y.max()) <= hi


def test_init_statistics():
    cfg = get_config("gray-3", env_override=False)
    spec = discriminator_spec(cfg)
    params, _ = init_network(jax.random.PRNGKey(4), spec)
    w = params[1]["w"]
    assert abs(float(w.mean())) < 0.002
    assert abs(float(w.std()) - 0.02) < 0.002
    # BN init: scale ~ N(1, 0.02), bias 0
    assert abs(float(params[1]["bn_scale"].mean()) - 1.0) < 0.02
    assert float(jnp.abs(params[1]["bn_bias"]).max()) == 0.0


def test_discriminator_param_scale():
    # largest D ~= 2.7M params (SURVEY.md §2.5)
    cfg = get_config("gray-3", env_override=False)
    params, _ = init_network(jax.random.PRNGKey(5), discriminator_spec(cfg))
    n = param_count(params)
    assert 2e6 < n < 3e6
