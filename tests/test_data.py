"""Data subsystem tests: folder indexer + cache, trainHook, prefetcher modes,
indexed path formatting, synthetic determinism."""

import os

import numpy as np
import pytest

from dcgan_sr_tpu.data import (
    FolderDataset,
    IndexedCelebA,
    PrefetchLoader,
    SyntheticImages,
    celeba_path,
)
from dcgan_sr_tpu.image.io import load_image, save_image


@pytest.fixture()
def image_tree(tmp_path):
    """Tiny on-disk fixture tree: 2 classes x 3 images."""
    rng = np.random.RandomState(0)
    for cls in ("a", "b"):
        d = tmp_path / "data" / cls
        d.mkdir(parents=True)
        for i in range(3):
            img = rng.rand(3, 40, 30).astype(np.float32)
            save_image(str(d / f"img{i}.png"), img)
    return str(tmp_path / "data")


def test_folder_index_and_cache(image_tree, tmp_path):
    cache = str(tmp_path / "cache")
    ds = FolderDataset(image_tree, load_size=24, fine_size=16,
                       cache_dir=cache, verbose=False)
    assert ds.size() == 6
    assert ds.classes == ["a", "b"]
    # cache file created and reused
    files = os.listdir(cache)
    assert len(files) == 1
    ds2 = FolderDataset(image_tree, load_size=24, fine_size=16, cache_dir=cache)
    assert ds2.paths == ds.paths


def test_train_hook_semantics(image_tree, tmp_path):
    ds = FolderDataset(image_tree, load_size=24, fine_size=16,
                       cache_dir=str(tmp_path / "c"))
    out = ds.train_hook(ds.paths[0], np.random.RandomState(1))
    assert out.shape == (3, 16, 16)
    # [0,1] -> [-1,1]
    assert out.min() >= -1.0 and out.max() <= 1.0 and out.min() < 0


def test_train_hook_crop_range():
    """Crop offsets replicate ceil(uniform(1e-2, dim-fs)): 0-based starts in
    [1, dim-fs] (image.crop offsets are 0-based; donkey_folder.lua:57-62) —
    offset 0 never sampled, offset dim-fs reachable."""
    from dcgan_sr_tpu.data.folder import crop_start
    rng = np.random.RandomState(3)
    starts = {crop_start(rng, 96, 64) for _ in range(2000)}
    assert min(starts) == 1 and max(starts) == 32
    assert starts == set(range(1, 33))
    assert crop_start(rng, 64, 64) == 0  # no slack -> offset 0


def test_folder_sample_batch(image_tree, tmp_path):
    ds = FolderDataset(image_tree, load_size=24, fine_size=16,
                       cache_dir=str(tmp_path / "c"))
    batch = ds.sample(4, np.random.RandomState(2))
    assert batch.shape == (4, 3, 16, 16)


def test_missing_root_raises():
    with pytest.raises(FileNotFoundError):
        FolderDataset("/nonexistent/root")


def test_celeba_path_zero_padding():
    # the if-ladder at train-gray-3.lua:242-254
    assert celeba_path("/r", 1).endswith("000001.jpg")
    assert celeba_path("/r", 99).endswith("000099.jpg")
    assert celeba_path("/r", 12345).endswith("012345.jpg")
    assert celeba_path("/r", 202100).endswith("202100.jpg")


def test_prefetch_sync_mode_deterministic():
    calls = []

    def sample(rng):
        v = rng.randint(0, 1 << 30)
        calls.append(v)
        return np.array([v])

    l1 = PrefetchLoader(sample, n_threads=0, manual_seed=7)
    a = [int(l1.get_batch()[0]) for _ in range(3)]
    l2 = PrefetchLoader(sample, n_threads=0, manual_seed=7)
    b = [int(l2.get_batch()[0]) for _ in range(3)]
    assert a == b


def test_prefetch_threaded_mode():
    def sample(rng):
        return rng.rand(2, 3)

    with PrefetchLoader(sample, n_threads=2, manual_seed=1) as loader:
        batches = [loader.get_batch() for _ in range(5)]
    assert all(b.shape == (2, 3) for b in batches)


def test_synthetic_deterministic_and_ranged():
    src = SyntheticImages(fine_size=32, nc=1, seed=9)
    a = src.load_one(5)
    b = src.load_one(5)
    np.testing.assert_array_equal(a, b)
    assert a.shape == (1, 32, 32)
    assert a.min() >= 0 and a.max() <= 1
    batch = src.load_batch(0, 4)
    assert batch.shape == (4, 1, 32, 32)
    # file 1..4 deterministic sequence
    np.testing.assert_array_equal(batch[0], src.load_one(1))


def test_image_io_roundtrip(tmp_path):
    img = np.random.RandomState(3).rand(3, 8, 8).astype(np.float32)
    p = str(tmp_path / "x.png")
    save_image(p, img)
    back = load_image(p, nc=3)
    np.testing.assert_allclose(back, img, atol=1 / 255 + 1e-6)
    gray = load_image(p, nc=1)
    assert gray.shape == (1, 8, 8)
    # rec601 luma convention (torch image.load nc=1)
    want = 0.299 * back[0] + 0.587 * back[1] + 0.114 * back[2]
    np.testing.assert_allclose(gray[0], want, atol=1e-6)


def test_textured_deterministic_and_bilinear_beatable():
    """TexturedImages: deterministic per (seed, index); its bilinear baseline
    leaves learnable headroom (the quality-protocol premise) — mean bilinear
    PSNR must sit well below the near-lossless regime of the smooth set."""
    from dcgan_sr_tpu.data import TexturedImages
    src = TexturedImages(64, nc=1, seed=1234)
    a, b = src.load_one(7), src.load_one(7)
    np.testing.assert_array_equal(a, b)
    assert a.shape == (1, 64, 64) and a.min() >= 0 and a.max() <= 1
    src2 = TexturedImages(64, nc=1, seed=1234)
    np.testing.assert_array_equal(src2.load_one(7), a)  # cross-instance
    batch = src.load_batch(2, 8)
    np.testing.assert_array_equal(batch[0], src.load_one(17))
    # texture content: high-frequency energy present (std of laplacian)
    lap = np.abs(np.diff(batch[:, 0], axis=-1)).mean()
    assert lap > 0.01, "set degenerated to smooth images"
