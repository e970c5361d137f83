"""Native C++ data-path tests: decode/resize parity vs the Python (PIL) path."""

import os
import subprocess

import numpy as np
import pytest

from dcgan_sr_tpu.data import native
from dcgan_sr_tpu.image.io import load_image as pil_load, save_image
from dcgan_sr_tpu.data.folder import _resize_chw

NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")


@pytest.fixture(scope="module")
def built():
    if not native.available():
        rc = subprocess.run(["make", "-C", NATIVE_DIR],
                            capture_output=True).returncode
        if rc != 0 or not native.available():
            pytest.skip("native toolchain unavailable")
    return True


def _make_pngs(tmp_path, n=3, hw=(40, 30)):
    rng = np.random.RandomState(0)
    paths = []
    for i in range(n):
        img = rng.rand(3, *hw).astype(np.float32)
        p = str(tmp_path / f"{i + 1:06d}.jpg".replace(".jpg", ".png"))
        save_image(p, img)
        paths.append(p)
    return paths


def test_native_decode_matches_pil(built, tmp_path):
    [p] = _make_pngs(tmp_path, n=1)
    nat = native.load_image(p, nc=1, out_h=16, out_w=16)
    ref_full = pil_load(p, nc=1)
    ref = _resize_chw(ref_full, 16, 16)
    np.testing.assert_allclose(nat, ref, atol=2e-6)


def test_native_decode_rgb(built, tmp_path):
    [p] = _make_pngs(tmp_path, n=1)
    nat = native.load_image(p, nc=3, out_h=20, out_w=20)
    ref = _resize_chw(pil_load(p, nc=3), 20, 20)
    assert nat.shape == (3, 20, 20)
    np.testing.assert_allclose(nat, ref, atol=2e-6)


def test_native_index_dir(built, tmp_path):
    _make_pngs(tmp_path, n=3)
    (tmp_path / "sub").mkdir()
    _make_pngs(tmp_path / "sub", n=2)
    paths = native.index_dir(str(tmp_path))
    assert len(paths) == 5
    assert all(p.endswith(".png") for p in paths)


def test_native_batch_loader(built, tmp_path):
    # name files like CelebA: 000001.png won't match .jpg route — use jpgs
    from PIL import Image
    rng = np.random.RandomState(1)
    for i in range(1, 5):
        arr = (rng.rand(24, 18, 3) * 255).astype(np.uint8)
        Image.fromarray(arr).save(str(tmp_path / f"{i:06d}.jpg"), quality=95)
    loader = native.NativeIndexedLoader(str(tmp_path), fine_size=16, nc=1,
                                        n_threads=2)
    batch = loader.load_batch(0, 4)
    assert batch.shape == (4, 1, 16, 16)
    assert np.isfinite(batch).all()
    assert 0 <= batch.min() and batch.max() <= 1
    # parity with the PIL path on the same JPEG bytes
    ref = _resize_chw(pil_load(str(tmp_path / "000001.jpg"), nc=1), 16, 16)
    np.testing.assert_allclose(batch[0], ref, atol=2e-6)
    loader.close()


def test_native_missing_file_raises(built, tmp_path):
    loader = native.NativeIndexedLoader(str(tmp_path), fine_size=8, nc=1)
    with pytest.raises(IOError):
        loader.load_batch(0, 2)
    loader.close()


def test_native_encode_bitmatches_pil(built, tmp_path):
    """dsr_save_png byte conversion == the PIL path exactly (round-half-to-
    even, clamp) for RGB and gray; PIL becomes optional for sample dumps."""
    rng = np.random.RandomState(5)
    for shape in ((3, 21, 33), (17, 19)):
        img = rng.rand(*shape).astype(np.float32)
        p_nat = str(tmp_path / f"nat{len(shape)}.png")
        p_pil = str(tmp_path / f"pil{len(shape)}.png")
        save_image(p_nat, img, native=True)
        save_image(p_pil, img, native=False)
        a = pil_load(p_nat, nc=3, dtype="byte")
        b = pil_load(p_pil, nc=3, dtype="byte")
        np.testing.assert_array_equal(a, b)


def test_native_encode_jpeg_roundtrip(built, tmp_path):
    rng = np.random.RandomState(6)
    img = rng.rand(3, 32, 32).astype(np.float32)
    p = str(tmp_path / "x.jpg")
    native.save_image(p, img, quality=95)
    back = pil_load(p, nc=3)
    assert back.shape == (3, 32, 32)
    assert np.abs(back - img).mean() < 0.25  # noise is JPEG's worst case


def test_save_display_through_native(built, tmp_path):
    """save_display (toDisplayTensor min-max + save) rides the native encoder
    when built - constant images save as black (test_tensor_to_image.lua)."""
    from dcgan_sr_tpu.image.io import save_display
    p = str(tmp_path / "const.png")
    save_display(p, np.full((8, 8), -1.0, np.float32))
    out = pil_load(p, nc=1, dtype="byte")
    assert int(out.max()) == 0


def test_null_loader_handle_raises_cleanly():
    """A NULL dsr_loader_create return must raise RuntimeError, not get
    passed to dsr_loader_load_batch as the handle (NULL deref segfault)."""

    class StubLib:
        def dsr_loader_create(self, *a):
            return None  # ctypes c_void_p restype maps NULL to None

    loader = native.NativeIndexedLoader.__new__(native.NativeIndexedLoader)
    loader._lib = StubLib()
    loader.route = "/nonexistent"
    loader.fine_size, loader.nc = 64, 1
    loader._handles, loader._n_threads = {}, 2
    with pytest.raises(RuntimeError, match="dsr_loader_create failed"):
        loader._handle(batch_size=4)
    assert loader._handles == {}  # a failed create is never cached


def test_native_index_dir_sorted_and_decodable_only(built, tmp_path):
    """index_dir's contract is a globally SORTED list (deterministic
    index -> file mapping) of extensions decode_file can actually decode;
    the C walk's LIFO stack visits subdirs in reverse order, and .bmp/.ppm
    would be guaranteed decode failures."""
    for d in ("a", "b", "c"):
        (tmp_path / d).mkdir()
        _make_pngs(tmp_path / d, n=1)
    (tmp_path / "a" / "skip.bmp").write_bytes(b"BM fake")
    (tmp_path / "b" / "skip.ppm").write_bytes(b"P6 fake")
    paths = native.index_dir(str(tmp_path))
    assert paths == sorted(paths)
    assert len(paths) == 3 and all(p.endswith(".png") for p in paths)


def test_native_index_dir_symlink_cycle_terminates(built, tmp_path):
    """A directory symlink cycle (child -> ancestor) must not loop the walk
    forever: each (device, inode) directory is entered once."""
    _make_pngs(tmp_path, n=2)
    sub = tmp_path / "sub"
    sub.mkdir()
    _make_pngs(sub, n=1)
    os.symlink(str(tmp_path), str(sub / "loop"))
    paths = native.index_dir(str(tmp_path))
    assert len(paths) == 3  # each real file indexed exactly once
