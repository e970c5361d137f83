"""Optional pixel-reconstruction loss (framework extension; 0.0 = parity)."""

import numpy as np
import jax
import jax.numpy as jnp

from dcgan_sr_tpu.core import get_config
from dcgan_sr_tpu.train import build_train_step, init_train_state

TINY = dict(ngf=4, ndf=8)


def _batch(seed=0):
    return jnp.asarray(np.random.RandomState(seed).rand(8, 1, 64, 64),
                       jnp.float32)


def test_zero_weight_is_exact_parity():
    hr = _batch(1)
    s0 = init_train_state(get_config("gray-3", env_override=False, **TINY),
                          jax.random.PRNGKey(2))
    cfg_off = get_config("gray-3", env_override=False, **TINY)
    cfg_zero = get_config("gray-3", env_override=False, pixel_loss_weight=0.0,
                          **TINY)
    a, ma = jax.jit(build_train_step(cfg_off))(s0, hr)
    s0b = init_train_state(cfg_zero, jax.random.PRNGKey(2))
    b, mb = jax.jit(build_train_step(cfg_zero))(s0b, hr)
    assert float(ma["errG"]) == float(mb["errG"])
    same = jax.tree_util.tree_map(lambda x, y: bool((x == y).all()),
                                  a.g_params, b.g_params)
    assert all(jax.tree_util.tree_leaves(same))


import pytest


@pytest.mark.slow  # training-dynamics check: 2x75 optimization steps on CPU
def test_pixel_loss_pulls_g_toward_real():
    """With a large pixel weight, reconstruction error must drop much faster
    than in the pure-adversarial run (8x8 patch config for fast CPU steps)."""
    hr = jnp.asarray(np.random.RandomState(3).rand(64, 1, 8, 8), jnp.float32)

    def run(weight, steps=75):
        # NB: a lax.scan multi-step here measured 5x SLOWER end-to-end on
        # CPU — the scanned program's compile dwarfs the dispatch loop.
        cfg = get_config("gray-patch-batch", env_override=False,
                         pixel_loss_weight=weight, **TINY)
        st = init_train_state(cfg, jax.random.PRNGKey(4))
        step = jax.jit(build_train_step(cfg), donate_argnums=(0,))
        for _ in range(steps):
            st, m = step(st, hr)
        return m, st

    from dcgan_sr_tpu.image.ops import box_downsample2
    from dcgan_sr_tpu.models import apply_network, generator_spec
    cfg = get_config("gray-patch-batch", env_override=False, **TINY)
    spec = generator_spec(cfg)

    def recon(st):
        fake, _ = apply_network(spec, st.g_params, box_downsample2(hr),
                                st.g_state)
        return float(jnp.mean((fake - hr) ** 2))

    _, st_w = run(1000.0)
    _, st_0 = run(0.0)
    assert recon(st_w) < 0.6 * recon(st_0), (recon(st_w), recon(st_0))


def test_pixel_loss_metric_reported():
    cfg = get_config("gray-3", env_override=False, pixel_loss_weight=10.0,
                     **TINY)
    st = init_train_state(cfg, jax.random.PRNGKey(5))
    _, m = jax.jit(build_train_step(cfg))(st, _batch(6))
    assert "pixel_loss" in m and float(m["pixel_loss"]) > 0
