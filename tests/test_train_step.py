"""Train-step tests: smoke per variant, determinism, DP-vs-single parity."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dcgan_sr_tpu.core import get_config
from dcgan_sr_tpu.parallel import build_dp_train_step, create_mesh, shard_batch
from dcgan_sr_tpu.train import build_train_step, init_train_state

# tiny widths keep compile times sane; topology/loss scheme still exercised
TINY = dict(ngf=4, ndf=8)


def _batch(cfg, b, seed=0):
    hr = np.random.RandomState(seed).rand(
        b, cfg.nc, cfg.train_size, cfg.train_size).astype(np.float32)
    if cfg.data_range == "pm1":
        hr = hr * 2 - 1
    return jnp.asarray(hr)


@pytest.mark.parametrize("variant", [
    "rgb-full", "gray", "gray-2", "gray-3", "gray-patch", "gray-patch-batch"])
def test_step_smoke(variant):
    cfg = get_config(variant, env_override=False, **TINY)
    state = init_train_state(cfg, jax.random.PRNGKey(0))
    step = jax.jit(build_train_step(cfg))
    hr = _batch(cfg, 8)
    new_state, m = step(state, hr)
    for k, v in m.items():
        assert np.isfinite(float(v)), (k, float(v))
    # both networks actually moved
    moved = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), state.g_params, new_state.g_params)
    assert max(jax.tree_util.tree_leaves(moved)) > 0
    moved_d = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), state.d_params, new_state.d_params)
    assert max(jax.tree_util.tree_leaves(moved_d)) > 0


def test_step_deterministic():
    cfg = get_config("gray-3", env_override=False, **TINY)
    step = jax.jit(build_train_step(cfg))
    hr = _batch(cfg, 8, seed=1)
    s1, m1 = step(init_train_state(cfg, jax.random.PRNGKey(7)), hr)
    s2, m2 = step(init_train_state(cfg, jax.random.PRNGKey(7)), hr)
    assert float(m1["errG"]) == float(m2["errG"])
    same = jax.tree_util.tree_map(
        lambda a, b: bool((a == b).all()), s1.g_params, s2.g_params)
    assert all(jax.tree_util.tree_leaves(same))


def test_error_regression_labels_feed_d():
    """train.lua scheme: D's fake target is the per-image quarter-MSE."""
    cfg = get_config("rgb-full", env_override=False, **TINY)
    step = jax.jit(build_train_step(cfg))
    state = init_train_state(cfg, jax.random.PRNGKey(3))
    _, m = step(state, _batch(cfg, 4, seed=2))
    # with an untrained G the per-image MSE targets are O(0.1) in [-1,1];
    # errD_fake = MSE(D(fake) in (0,1), those targets) must be finite & small
    assert 0 <= float(m["errD_fake"]) < 2.0


def test_dp_matches_single_device():
    """shard_map DP step == single-device step up to fp32 reduction noise.

    Losses agree to ~1e-4; params agree to <= 2*lr + slack because Adam's
    first step is ~lr*sign(g) and last-bit gradient noise can flip the sign
    of near-zero gradients.
    """
    cfg = get_config("gray-3", env_override=False, **TINY)
    hr = _batch(cfg, 16, seed=4)

    step = jax.jit(build_train_step(cfg))
    s1, m1 = step(init_train_state(cfg, jax.random.PRNGKey(42)), hr)

    mesh = create_mesh(8)
    dstep = build_dp_train_step(cfg, mesh)
    s2, m2 = dstep(init_train_state(cfg, jax.random.PRNGKey(42)),
                   shard_batch(hr, mesh))

    for k in m1:
        np.testing.assert_allclose(float(m1[k]), float(m2[k]), rtol=1e-3,
                                   atol=1e-4, err_msg=k)
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), s1.g_params, s2.g_params)
    assert max(jax.tree_util.tree_leaves(diffs)) <= 2.1 * cfg.lr


def test_feed_bf16_equals_prequantized_f32():
    """A bf16-fed step must equal the f32 step on pre-quantized pixels
    EXACTLY: the step upcasts bf16 leaves to f32 at entry (train/step.py),
    so --feed-bf16 changes transfer bytes, never training math. Covers the
    plain batch and the device_augment pytree (canvas bf16, offsets int)."""
    cfg = get_config("gray-3", env_override=False, **TINY)
    state = init_train_state(cfg, jax.random.PRNGKey(0))
    step = jax.jit(build_train_step(cfg))
    hr = np.random.RandomState(7).rand(8, 1, 64, 64).astype(np.float32)
    hr16 = hr.astype(jnp.bfloat16)

    s16, m16 = step(state, jnp.asarray(hr16))
    sf, mf = step(state, jnp.asarray(hr16).astype(jnp.float32))
    for k in mf:
        assert float(m16[k]) == float(mf[k]), k
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        s16.g_params, sf.g_params)

    # device_augment pytree: only the canvas leaf is bf16
    cfga = get_config("gray-3", env_override=False, device_augment=True,
                      device_preprocess=True, **TINY)
    statea = init_train_state(cfga, jax.random.PRNGKey(0))
    stepa = jax.jit(build_train_step(cfga))
    rng = np.random.RandomState(8)
    canvas = rng.rand(8, 3, 78, 64).astype(np.float32)
    tops = rng.randint(0, 14, 8).astype(np.int32)
    lefts = np.zeros(8, np.int32)
    flips = rng.randint(0, 2, 8).astype(bool)
    b16 = (jnp.asarray(canvas.astype(jnp.bfloat16)), tops, lefts, flips)
    bf = (jnp.asarray(b16[0]).astype(jnp.float32), tops, lefts, flips)
    _, ma16 = stepa(statea, b16)
    _, maf = stepa(statea, bf)
    for k in maf:
        assert float(ma16[k]) == float(maf[k]), k
