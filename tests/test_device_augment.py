"""Device-side trainHook augmentation (cfg.device_augment).

The north star moves the donkey's post-decode work on-chip
(donkey_folder.lua:52-70): with device_augment the train step receives raw
loadSize canvases and performs the random crop + hflip on device
(image/ops.random_crop_hflip) before the fused gray/normalize/degrade
preprocess. The per-step PRNG key derives from manualSeed and the Adam step
counter (train/step.py), so the (state, batch) signature is unchanged.
"""

import numpy as np
import jax
import jax.numpy as jnp

from dcgan_sr_tpu.core import get_config
from dcgan_sr_tpu.data.folder import crop_start
from dcgan_sr_tpu.image.ops import random_crop_hflip
from dcgan_sr_tpu.train import build_train_step, init_train_state

TINY = dict(ngf=4, ndf=8, manualSeed=11)


def test_constant_canvas_matches_precropped_step():
    """Crop/flip are content-identities on constant images: the augment step
    on (B,3,96,96) constants must equal the device_preprocess step on the
    (B,3,64,64) constant crops exactly."""
    vals = np.linspace(0.1, 0.9, 6, dtype=np.float32)
    canvas = np.broadcast_to(vals[:, None, None, None],
                             (6, 3, 96, 96)).copy()
    cropped = canvas[:, :, :64, :64].copy()

    cfg_aug = get_config("gray", env_override=False, device_augment=True,
                         device_preprocess=True, **TINY)
    cfg_pre = get_config("gray", env_override=False, device_preprocess=True,
                         **TINY)
    s_a, m_a = jax.jit(build_train_step(cfg_aug))(
        init_train_state(cfg_aug, jax.random.PRNGKey(1)), jnp.asarray(canvas))
    s_p, m_p = jax.jit(build_train_step(cfg_pre))(
        init_train_state(cfg_pre, jax.random.PRNGKey(1)), jnp.asarray(cropped))

    np.testing.assert_allclose(float(m_a["errG"]), float(m_p["errG"]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(m_a["errD"]), float(m_p["errD"]),
                               rtol=1e-5, atol=1e-6)
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), s_a.g_params, s_p.g_params)
    assert max(jax.tree_util.tree_leaves(diffs)) < 1e-6


def test_step_key_offsets_match_host_hook_distribution():
    """Crops drawn with the step's key derivation land on the host hook's
    offset support: {1..dim-fine} (offset 0 never sampled — the reference's
    ceil(uniform(1e-2, ..)) quirk, donkey_folder.lua:57-62), flips ~ p=0.5."""
    ls, fine, b = 96, 64, 32
    # canvas encodes position: pixel (y, x) = y*ls + x, channel-constant
    pos = (np.arange(ls)[:, None] * ls + np.arange(ls)[None, :]).astype(np.float32)
    canvas = np.broadcast_to(pos, (b, 3, ls, ls)).copy()

    tops, lefts, flips = [], [], []
    for t in range(8):  # the step folds the Adam counter into the seed key
        key = jax.random.fold_in(jax.random.PRNGKey(TINY["manualSeed"]),
                                 jnp.asarray(t, jnp.int32))
        out = np.asarray(random_crop_hflip(key, jnp.asarray(canvas), fine))
        for i in range(b):
            c = out[i, 0]
            flipped = c[0, 0] > c[0, -1]
            row = c[0, ::-1] if flipped else c[0]
            top, left = int(row[0]) // ls, int(row[0]) % ls
            # the recovered window really is that canvas sub-window (+flip)
            np.testing.assert_array_equal(
                row, pos[top, left:left + fine])
            tops.append(top)
            lefts.append(left)
            flips.append(bool(flipped))

    lo, hi = 1, ls - fine  # == crop_start's support for dim > fine
    assert min(tops) >= lo and max(tops) <= hi, (min(tops), max(tops))
    assert min(lefts) >= lo and max(lefts) <= hi
    assert 0.2 < np.mean(flips) < 0.8
    # host hook support sanity: crop_start never returns 0 either
    host = [crop_start(np.random.RandomState(s), ls, fine) for s in range(200)]
    assert min(host) >= lo and max(host) <= hi


def test_augmentation_is_deterministic_per_state_and_varies_per_step():
    cfg = get_config("gray", env_override=False, device_augment=True,
                     device_preprocess=True, **TINY)
    step = jax.jit(build_train_step(cfg))
    canvas = jnp.asarray(
        np.random.RandomState(3).rand(4, 3, 96, 96), jnp.float32)
    st0 = init_train_state(cfg, jax.random.PRNGKey(2))
    _, m1 = step(st0, canvas)
    _, m2 = step(init_train_state(cfg, jax.random.PRNGKey(2)), canvas)
    assert float(m1["errD"]) == float(m2["errD"])  # same t -> same crops
    st1, _ = step(st0, canvas)
    _, m3 = step(st1, canvas)  # t advanced -> different crops
    assert float(m3["errD"]) != float(m1["errD"])


def test_device_augment_under_dp_shards_get_independent_crops():
    """Under shard_map the axis index folds into the key, so replicas crop
    their batch slices independently; the DP step runs finite."""
    from dcgan_sr_tpu.parallel import build_dp_train_step, create_mesh, shard_batch

    n = min(jax.device_count(), 8)
    if n < 2:
        import pytest
        pytest.skip("needs a multi-device (virtual) mesh")
    cfg = get_config("gray", env_override=False, device_augment=True,
                     device_preprocess=True, **TINY)
    mesh = create_mesh(n)
    step = build_dp_train_step(cfg, mesh)
    canvas = jnp.asarray(
        np.random.RandomState(4).rand(2 * n, 3, 96, 96), jnp.float32)
    st = init_train_state(cfg, jax.random.PRNGKey(5))
    st, m = step(st, shard_batch(canvas, mesh))
    for v in m.values():
        assert np.isfinite(float(v))
