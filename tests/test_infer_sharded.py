"""Sharded tiled inference == unsharded, on the 8-device virtual mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from dcgan_sr_tpu.core import get_config
from dcgan_sr_tpu.infer.tiled import make_overlap_sr_fn
from dcgan_sr_tpu.parallel import create_mesh
from dcgan_sr_tpu.train import init_train_state

TINY = dict(ngf=4, ndf=8)


def test_sharded_overlap_sr_matches_single():
    cfg = get_config("gray-patch-batch-overlap", env_override=False, **TINY)
    st = init_train_state(cfg, jax.random.PRNGKey(0))
    imgs = jnp.asarray(np.random.RandomState(0).rand(8, 64, 64), jnp.float32)

    single = make_overlap_sr_fn(cfg)(st.g_params, st.g_state, imgs)
    mesh = create_mesh(8)
    sharded = make_overlap_sr_fn(cfg, mesh=mesh)(st.g_params, st.g_state, imgs)

    # per-image pipelines are independent -> sharding must be exact up to
    # conv fusion noise
    np.testing.assert_allclose(np.asarray(sharded["naive"]),
                               np.asarray(single["naive"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(sharded["seam"]),
                               np.asarray(single["seam"]), atol=1e-5)
    # outputs really are sharded over the mesh
    assert len(sharded["seam"].sharding.device_set) == 8


def test_flat_tiles_matches_vmapped_under_bn_eval():
    """flat_tiles (one (N*T)-tile generator dispatch) must reproduce the
    vmapped per-image pipeline exactly under bn_eval: running-stats BN has no
    cross-tile coupling, so flattening the batch is a pure layout change."""
    import pytest

    cfg = get_config("gray-patch-batch-overlap", env_override=False, **TINY)
    st = init_train_state(cfg, jax.random.PRNGKey(0))
    imgs = jnp.asarray(np.random.RandomState(1).rand(4, 64, 64), jnp.float32)

    vmapped = make_overlap_sr_fn(cfg, bn_eval=True, flat_tiles=False)(
        st.g_params, st.g_state, imgs)
    flat = make_overlap_sr_fn(cfg, bn_eval=True, flat_tiles=True)(
        st.g_params, st.g_state, imgs)
    for k in ("naive", "seam"):
        np.testing.assert_allclose(np.asarray(flat[k]),
                                   np.asarray(vmapped[k]), atol=1e-6)

    # train-mode BN pools stats across images in a flat batch — must refuse
    with pytest.raises(ValueError):
        make_overlap_sr_fn(cfg, bn_eval=False, flat_tiles=True)

def test_lr_input_matches_protocol_on_degraded_images():
    """True-2x mode: feeding the degraded image as an LR input must reproduce
    the protocol pipeline (which degrades internally) EXACTLY — the half-
    geometry tile gather commutes with the 2x2 box degrade on the even-aligned
    tile grid, so the generator sees bit-identical tile batches."""
    from dcgan_sr_tpu.image.ops import box_downsample2

    cfg = get_config("gray-patch-batch-overlap", env_override=False, **TINY)
    st = init_train_state(cfg, jax.random.PRNGKey(0))
    imgs = jnp.asarray(np.random.RandomState(2).rand(3, 64, 64), jnp.float32)
    lr = box_downsample2(imgs)                               # (3, 32, 32)

    for kw in (dict(), dict(bn_eval=True)):                  # both BN modes
        proto = make_overlap_sr_fn(cfg, **kw)(st.g_params, st.g_state, imgs)
        true2x = make_overlap_sr_fn(cfg, lr_input=True, **kw)(
            st.g_params, st.g_state, lr)
        for k in ("naive", "seam"):
            np.testing.assert_allclose(np.asarray(true2x[k]),
                                       np.asarray(proto[k]), atol=1e-6)
    assert true2x["seam"].shape == (3, 64, 64)               # 2x the input


def test_lr_input_rectangular_and_pad_helper():
    """lr_pad_dim yields a legal LR extent; the 2x output has twice the dims."""
    from dcgan_sr_tpu.infer.tiled import lr_pad_dim

    cfg = get_config("gray-patch-batch-overlap", env_override=False, **TINY)
    st = init_train_state(cfg, jax.random.PRNGKey(0))
    p, ov = cfg.patchSize, cfg.overlap
    h, w = lr_pad_dim(17, p, ov), lr_pad_dim(23, p, ov)
    lr = jnp.asarray(np.random.RandomState(3).rand(2, h, w), jnp.float32)
    out = make_overlap_sr_fn(cfg, lr_input=True, fine=(2 * h, 2 * w),
                             bn_eval=True)(st.g_params, st.g_state, lr)
    assert out["seam"].shape == (2, 2 * h, 2 * w)
    assert np.isfinite(np.asarray(out["seam"])).all()

def test_sharded_lr_input_matches_single():
    """The serving pipeline (lr_input true-2x) sharded over the mesh must
    match the single-device result — per-image pipelines are independent."""
    cfg = get_config("gray-patch-batch-overlap", env_override=False, **TINY)
    st = init_train_state(cfg, jax.random.PRNGKey(0))
    lr = jnp.asarray(np.random.RandomState(4).rand(8, 32, 32), jnp.float32)

    single = make_overlap_sr_fn(cfg, lr_input=True, bn_eval=True)(
        st.g_params, st.g_state, lr)
    mesh = create_mesh(8)
    sharded = make_overlap_sr_fn(cfg, mesh=mesh, lr_input=True, bn_eval=True)(
        st.g_params, st.g_state, lr)
    np.testing.assert_allclose(np.asarray(sharded["seam"]),
                               np.asarray(single["seam"]), atol=1e-5)
    assert sharded["seam"].shape == (8, 64, 64)
    assert len(sharded["seam"].sharding.device_set) == 8

def test_full_sr_train_bn_is_per_image():
    """make_full_sr_fn under train-mode BN normalizes each image with its OWN
    batch-1 statistics (the reference's single-image testSample forward,
    train-gray.lua:326-380): a request's pixels must not depend on what it
    was co-batched with (serving coalesces arbitrary requests; the directory
    tool pads batches for shardability)."""
    from dcgan_sr_tpu.infer.tiled import make_full_sr_fn

    cfg = get_config("gray-3", env_override=False, **TINY)
    st = init_train_state(cfg, jax.random.PRNGKey(0))
    rng = np.random.RandomState(5)
    imgs = jnp.asarray(rng.rand(3, 1, 16, 16), jnp.float32)

    fn = make_full_sr_fn(cfg, lr_input=True, bn_eval=False)
    batched = np.asarray(fn(st.g_params, st.g_state, imgs))
    assert batched.shape == (3, 1, 32, 32)
    for i in range(3):
        alone = np.asarray(fn(st.g_params, st.g_state, imgs[i:i + 1]))[0]
        np.testing.assert_allclose(batched[i], alone, atol=1e-6)
