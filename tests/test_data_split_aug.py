"""Train/test split, device-side augmentation, orbax checkpoint backend."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dcgan_sr_tpu.data import FolderDataset
from dcgan_sr_tpu.image import crop, hflip, random_crop_hflip
from dcgan_sr_tpu.image.io import save_image


@pytest.fixture()
def tree(tmp_path):
    rng = np.random.RandomState(0)
    for cls in ("a", "b"):
        d = tmp_path / "data" / cls
        d.mkdir(parents=True)
        for i in range(10):
            save_image(str(d / f"i{i}.png"), rng.rand(3, 30, 30).astype(np.float32))
    return str(tmp_path / "data")


def test_split_partitions(tree, tmp_path):
    ds = FolderDataset(tree, load_size=24, fine_size=16,
                       cache_dir=str(tmp_path / "c"), split=80, seed=1)
    assert ds.size() == 16 and ds.test_size() == 4
    assert set(ds.paths).isdisjoint(ds.test_paths)
    # deterministic under the same seed
    ds2 = FolderDataset(tree, load_size=24, fine_size=16,
                        cache_dir=str(tmp_path / "c"), split=80, seed=1)
    assert ds2.paths == ds.paths and ds2.test_paths == ds.test_paths
    batch = ds.get_test(1, 4)
    assert batch.shape == (4, 3, 16, 16)
    assert -1 <= batch.min() and batch.max() <= 1


def test_crop_hflip_ops():
    x = jnp.arange(2 * 1 * 4 * 4, dtype=jnp.float32).reshape(2, 1, 4, 4)
    c = crop(x, 1, 2, 2, 2)
    np.testing.assert_array_equal(np.asarray(c[0, 0]),
                                  np.asarray(x[0, 0])[1:3, 2:4])
    f = hflip(x)
    np.testing.assert_array_equal(np.asarray(f[0, 0]),
                                  np.asarray(x[0, 0])[:, ::-1])


def test_random_crop_hflip_device():
    batch = jnp.asarray(np.random.RandomState(2).rand(8, 3, 24, 24), jnp.float32)
    out = jax.jit(lambda k, b: random_crop_hflip(k, b, 16))(
        jax.random.PRNGKey(0), batch)
    assert out.shape == (8, 3, 16, 16)
    # every crop is a contiguous window of the source (check image 0)
    src = np.asarray(batch[0])
    got = np.asarray(out[0])
    found = False
    for top in range(9):
        for left in range(9):
            win = src[:, top:top + 16, left:left + 16]
            if np.array_equal(got, win) or np.array_equal(got, win[:, :, ::-1]):
                found = True
    assert found
    # deterministic per key, different across keys
    out2 = random_crop_hflip(jax.random.PRNGKey(0), batch, 16)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
    out3 = random_crop_hflip(jax.random.PRNGKey(1), batch, 16)
    assert not np.array_equal(np.asarray(out), np.asarray(out3))


def test_orbax_checkpoint_roundtrip(tmp_path):
    from dcgan_sr_tpu.core import get_config
    from dcgan_sr_tpu.train import init_train_state
    from dcgan_sr_tpu.train.checkpoint import (load_checkpoint_orbax,
                                               save_checkpoint_orbax)

    cfg = get_config("gray-3", env_override=False, ngf=4, ndf=8)
    state = init_train_state(cfg, jax.random.PRNGKey(0))
    save_checkpoint_orbax(str(tmp_path), cfg.name, 1, state)
    tmpl = init_train_state(cfg, jax.random.PRNGKey(9))
    back = load_checkpoint_orbax(str(tmp_path), cfg.name, 1, tmpl)
    same = jax.tree_util.tree_map(
        lambda a, b: bool(np.array_equal(np.asarray(a), np.asarray(b))),
        state.g_params, back.g_params)
    assert all(jax.tree_util.tree_leaves(same))
