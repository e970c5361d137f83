"""Device-side trainHook augmentation (cfg.device_augment).

The north star moves the donkey's post-decode work on-chip
(donkey_folder.lua:52-70): with device_augment the train step receives
(canvas, tops, lefts, flips) batches — raw loadSize canvases plus HOST-drawn
crop offsets/flip coins from the reference's SINGLE uniform draw over the
full aspect-resized image — and performs the crop + hflip pixel work on
device (image/ops.crop_hflip_at) before the fused gray/normalize/degrade
preprocess.  Host-drawn offsets keep the crop distribution exactly the
reference trainHook's: composing two independent uniforms (host long-dim
pre-crop x device crop) would be triangular and never sample offset 1.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dcgan_sr_tpu.core import get_config
from dcgan_sr_tpu.data.folder import FolderDataset, crop_start
from dcgan_sr_tpu.image.io import save_image
from dcgan_sr_tpu.image.ops import crop_hflip_at
from dcgan_sr_tpu.train import build_train_step, init_train_state

TINY = dict(ngf=4, ndf=8, manualSeed=11)


def _aug_batch(canvas, tops=None, lefts=None, flips=None):
    b = len(canvas)
    z = np.zeros(b, np.int32)
    return (jnp.asarray(canvas),
            jnp.asarray(z if tops is None else tops),
            jnp.asarray(z if lefts is None else lefts),
            jnp.asarray(np.zeros(b, bool) if flips is None else flips))


def _tiny_folder(tmp_path, n=5, hw=(120, 100)):
    """A tiny on-disk class folder (PNG) for FolderDataset tests."""
    rng = np.random.RandomState(7)
    root = tmp_path / "celeba"
    (root / "faces").mkdir(parents=True)
    for i in range(n):
        save_image(str(root / "faces" / f"{i}.png"),
                   rng.rand(3, *hw).astype(np.float32))
    return str(root)


def test_constant_canvas_matches_precropped_step():
    """Crop/flip are content-identities on constant images: the augment step
    on (B,3,96,96) constants must equal the device_preprocess step on the
    (B,3,64,64) constant crops exactly."""
    vals = np.linspace(0.1, 0.9, 6, dtype=np.float32)
    canvas = np.broadcast_to(vals[:, None, None, None],
                             (6, 3, 96, 96)).copy()
    cropped = canvas[:, :, :64, :64].copy()
    tops = np.arange(1, 7, dtype=np.int32)  # arbitrary valid offsets
    flips = np.arange(6) % 2 == 0

    cfg_aug = get_config("gray", env_override=False, device_augment=True,
                         device_preprocess=True, **TINY)
    cfg_pre = get_config("gray", env_override=False, device_preprocess=True,
                         **TINY)
    s_a, m_a = jax.jit(build_train_step(cfg_aug))(
        init_train_state(cfg_aug, jax.random.PRNGKey(1)),
        _aug_batch(canvas, tops=tops, lefts=tops, flips=flips))
    s_p, m_p = jax.jit(build_train_step(cfg_pre))(
        init_train_state(cfg_pre, jax.random.PRNGKey(1)), jnp.asarray(cropped))

    np.testing.assert_allclose(float(m_a["errG"]), float(m_p["errG"]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(m_a["errD"]), float(m_p["errD"]),
                               rtol=1e-5, atol=1e-6)
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), s_a.g_params, s_p.g_params)
    assert max(jax.tree_util.tree_leaves(diffs)) < 1e-6


def test_composed_device_crop_matches_host_hook_bitexact(tmp_path):
    """sample_canvas + crop_hflip_at == sample(normalize=False) BIT-EXACTLY
    under equal-seeded rngs: same per-image rng order (class, path, h1, w1,
    flip) and the same total crop window — the device path is the host
    trainHook, relocated."""
    root = _tiny_folder(tmp_path)
    ds = FolderDataset(root, load_size=96, fine_size=64, nc=3,
                       cache_dir=str(tmp_path / "cache"))
    host = ds.sample(16, np.random.RandomState(3), normalize=False)
    canvas, tops, lefts, flips = ds.sample_canvas(16, np.random.RandomState(3))
    dev = np.asarray(crop_hflip_at(jnp.asarray(canvas), jnp.asarray(tops),
                                   jnp.asarray(lefts), jnp.asarray(flips), 64))
    np.testing.assert_array_equal(dev, host)
    # residuals stay inside the canvas crop window
    assert tops.min() >= 0 and tops.max() <= 96 - 64
    assert lefts.min() >= 0 and lefts.max() <= 96 - 64
    assert 0.2 < flips.mean() < 0.8


def test_composed_crop_bitexact_when_loadsize_equals_finesize(tmp_path):
    """loadSize == fineSize: the residual range collapses to {0}, so the host
    pre-crop must absorb the WHOLE drawn offset (a residual of 1 would be
    silently clamped by dynamic_slice, shifting every crop by one pixel).
    Rect source images keep the long dim > loadSize so offsets are live."""
    root = _tiny_folder(tmp_path, hw=(120, 80))
    ds = FolderDataset(root, load_size=64, fine_size=64, nc=3,
                       cache_dir=str(tmp_path / "cache"))
    host = ds.sample(8, np.random.RandomState(9), normalize=False)
    canvas, tops, lefts, flips = ds.sample_canvas(8, np.random.RandomState(9))
    assert tops.max() == 0 and lefts.max() == 0
    dev = np.asarray(crop_hflip_at(jnp.asarray(canvas), jnp.asarray(tops),
                                   jnp.asarray(lefts), jnp.asarray(flips), 64))
    np.testing.assert_array_equal(dev, host)


def test_total_offset_support_is_reference_uniform(tmp_path):
    """When the aspect-resized long dim exceeds loadSize, the COMPOSED total
    offset (host pre-crop + device residual) must cover the reference's one-
    draw support {1..dim-fine} — including offset 1 and dim-fine, which a
    two-independent-uniforms composition can never / rarely reach — with no
    triangular bias."""
    root = _tiny_folder(tmp_path, n=1)
    ls, fs, long_dim = 24, 16, 40
    ds = FolderDataset(root, load_size=ls, fine_size=fs, nc=3,
                       cache_dir=str(tmp_path / "cache"))
    # position-encoded rect image (rows = long dim), bypassing decode/resize
    pos = (np.arange(long_dim)[:, None] * 1000.0
           + np.arange(ls)[None, :]).astype(np.float32)
    ds._load_resized = lambda path: np.broadcast_to(
        pos, (3, long_dim, ls)).copy()

    rng = np.random.RandomState(0)
    totals = []
    for _ in range(40):
        canvas, tops, lefts, flips = ds.sample_canvas(16, rng)
        ch = (canvas[:, 0, 0, 0] // 1000).astype(int)  # host pre-crop row
        totals.extend((ch + np.asarray(tops)).tolist())
        # width == loadSize: the host pre-crop is 0, residual is the draw
        assert np.all(np.asarray(lefts) >= 1)
        assert np.all(np.asarray(lefts) <= ls - fs)
    totals = np.asarray(totals)
    lo, hi = 1, long_dim - fs  # crop_start's support over the FULL image
    assert totals.min() == lo and totals.max() == hi, (totals.min(), totals.max())
    counts = np.bincount(totals, minlength=hi + 1)[lo:]
    # uniform over 24 bins, 640 draws (~26.7/bin): every bin hit, no
    # triangular peak (a composed-uniform triangle would triple the center)
    assert counts.min() > 0
    assert counts.max() < 3.0 * counts.mean()
    # host-hook support sanity: crop_start never returns 0 for dim > fine
    host = [crop_start(np.random.RandomState(s), long_dim, fs)
            for s in range(200)]
    assert min(host) >= lo and max(host) <= hi


def test_augmentation_is_deterministic_per_batch():
    """The step is a pure function of (state, batch): same offsets -> same
    metrics; different offsets -> different crops -> different metrics."""
    cfg = get_config("gray", env_override=False, device_augment=True,
                     device_preprocess=True, **TINY)
    step = jax.jit(build_train_step(cfg))
    canvas = np.random.RandomState(3).rand(4, 3, 96, 96).astype(np.float32)
    tops = np.asarray([1, 5, 9, 13], np.int32)
    st0 = init_train_state(cfg, jax.random.PRNGKey(2))
    _, m1 = step(st0, _aug_batch(canvas, tops=tops, lefts=tops))
    _, m2 = step(init_train_state(cfg, jax.random.PRNGKey(2)),
                 _aug_batch(canvas, tops=tops, lefts=tops))
    assert float(m1["errD"]) == float(m2["errD"])
    _, m3 = step(init_train_state(cfg, jax.random.PRNGKey(2)),
                 _aug_batch(canvas, tops=tops + 2, lefts=tops))
    assert float(m3["errD"]) != float(m1["errD"])


def test_device_augment_under_dp_shards_offsets_with_batch():
    """Under shard_map the (canvas, tops, lefts, flips) tuple shards on its
    leading batch dim like any other batch; the DP step runs finite."""
    from dcgan_sr_tpu.parallel import build_dp_train_step, create_mesh, shard_batch

    n = min(jax.device_count(), 8)
    if n < 2:
        pytest.skip("needs a multi-device (virtual) mesh")
    cfg = get_config("gray", env_override=False, device_augment=True,
                     device_preprocess=True, **TINY)
    mesh = create_mesh(n)
    step = build_dp_train_step(cfg, mesh)
    b = 2 * n
    rng = np.random.RandomState(4)
    batch = (jnp.asarray(rng.rand(b, 3, 96, 96), jnp.float32),
             jnp.asarray(rng.randint(1, 33, size=b), jnp.int32),
             jnp.asarray(rng.randint(1, 33, size=b), jnp.int32),
             jnp.asarray(rng.rand(b) > 0.5))
    st = init_train_state(cfg, jax.random.PRNGKey(5))
    st, m = step(st, shard_batch(batch, mesh))
    for v in m.values():
        assert np.isfinite(float(v))
