"""Device-side preprocess in the train step == host-side preprocess.

cfg.device_preprocess feeds the step raw [0,1] RGB; the fused Pallas kernel
does gray-convert + normalize + degrade on device.  Must match feeding the
host-converted batch exactly (parity of the north-star on-chip donkey)."""

import numpy as np
import jax
import jax.numpy as jnp

from dcgan_sr_tpu.core import get_config
from dcgan_sr_tpu.image.ops import normalize_pm1, rgb2gray
from dcgan_sr_tpu.train import build_train_step, init_train_state

TINY = dict(ngf=4, ndf=8)


def test_device_preprocess_matches_host():
    raw = jnp.asarray(np.random.RandomState(0).rand(6, 3, 64, 64), jnp.float32)
    host_hr = np.asarray(normalize_pm1(rgb2gray(raw)))[:, None]

    cfg_host = get_config("gray", env_override=False, **TINY)
    cfg_dev = get_config("gray", env_override=False, device_preprocess=True,
                         **TINY)

    s_h, m_h = jax.jit(build_train_step(cfg_host))(
        init_train_state(cfg_host, jax.random.PRNGKey(1)), jnp.asarray(host_hr))
    s_d, m_d = jax.jit(build_train_step(cfg_dev))(
        init_train_state(cfg_dev, jax.random.PRNGKey(1)), raw)

    np.testing.assert_allclose(float(m_h["errG"]), float(m_d["errG"]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(m_h["errD"]), float(m_d["errD"]),
                               rtol=1e-5, atol=1e-6)
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), s_h.g_params, s_d.g_params)
    assert max(jax.tree_util.tree_leaves(diffs)) < 1e-6


def test_device_preprocess_rgb_variant():
    """rgb-full: device path normalizes only (nc=3, pm1), no gray convert."""
    raw = jnp.asarray(np.random.RandomState(2).rand(4, 3, 64, 64), jnp.float32)
    cfg = get_config("rgb-full", env_override=False, device_preprocess=True,
                     **TINY)
    st = init_train_state(cfg, jax.random.PRNGKey(3))
    _, m = jax.jit(build_train_step(cfg))(st, raw)
    assert np.isfinite(float(m["errG"])) and np.isfinite(float(m["errD"]))

    cfg_h = get_config("rgb-full", env_override=False, **TINY)
    _, m_h = jax.jit(build_train_step(cfg_h))(
        init_train_state(cfg_h, jax.random.PRNGKey(3)),
        jnp.asarray(np.asarray(normalize_pm1(raw))))
    np.testing.assert_allclose(float(m["errG"]), float(m_h["errG"]),
                               rtol=1e-5, atol=1e-6)
