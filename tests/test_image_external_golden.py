"""External goldens for the image round-trip and image.scale — fixtures
authored BY HAND (raw PNG bytes; hand-computed bilinear values), independent
of both PIL and our own code paths (VERDICT.md round-1 'missing' #3).

* PNG fixtures are byte-literal files built from the PNG spec (IHDR/IDAT/
  IEND, zlib stored-deflate) — the probe set of the reference's
  test_image_to_tensor.lua:1-30 (black, white, #333333, and a 4-value
  'all4'), which pins the decode convention: CHW, [0,1] float or 0-255 byte.
* image.scale bilinear expectations are hand-computed under the
  endpoint-aligned convention (source position = i*(in-1)/(out-1)) that
  torch7's image C library uses (the align_corners=True lineage of torch —
  PyTorch's UpsamplingBilinear2d documents align_corners=True as the
  original Torch behavior).
"""

import struct
import zlib

import numpy as np
import pytest

from dcgan_sr_tpu.image.io import load_image
from dcgan_sr_tpu.image.ops import resize_bilinear, to_display


# ---- hand-authored PNG writer (spec-literal, no PIL) -----------------------
def _chunk(tag, payload):
    return (struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))


def write_png_rgb8(path, pixels):
    """pixels: (H, W, 3) uint8 -> minimal valid RGB8 PNG, by hand."""
    h, w, _ = pixels.shape
    raw = b"".join(b"\x00" + pixels[y].tobytes() for y in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit, color type 2
    data = (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(raw, 0)) + _chunk(b"IEND", b""))
    with open(path, "wb") as f:
        f.write(data)


PROBES = {
    # name -> (constant byte value or explicit 2x2 pattern)
    "image_black": 0,
    "image_white": 255,
    "image_333333": 0x33,  # 51
}


@pytest.mark.parametrize("name,val", sorted(PROBES.items()))
def test_probe_png_decodes_to_exact_bytes(tmp_path, name, val):
    """image.load(path, 3, 'byte') must see exactly the authored bytes
    (test_image_to_tensor.lua's constant-color probes)."""
    p = str(tmp_path / f"{name}.png")
    write_png_rgb8(p, np.full((4, 6, 3), val, np.uint8))
    byte = load_image(p, nc=3, dtype="byte")
    assert byte.shape == (3, 4, 6)
    assert byte.min() == byte.max() == val
    flt = load_image(p, nc=3, dtype="float")
    np.testing.assert_allclose(flt, val / 255.0, atol=1e-7)


def test_probe_png_all4(tmp_path):
    """A 2x2 four-value probe pins channel order and row direction."""
    px = np.zeros((2, 2, 3), np.uint8)
    px[0, 0] = (255, 0, 0)    # top-left red
    px[0, 1] = (0, 255, 0)    # top-right green
    px[1, 0] = (0, 0, 255)    # bottom-left blue
    px[1, 1] = (255, 255, 255)
    p = str(tmp_path / "image_all4.png")
    write_png_rgb8(p, px)
    byte = load_image(p, nc=3, dtype="byte")
    # CHW: channel 0 = R etc.; row 0 = top
    np.testing.assert_array_equal(byte[:, 0, 0], [255, 0, 0])
    np.testing.assert_array_equal(byte[:, 0, 1], [0, 255, 0])
    np.testing.assert_array_equal(byte[:, 1, 0], [0, 0, 255])
    np.testing.assert_array_equal(byte[:, 1, 1], [255, 255, 255])


def test_probe_decodes_native_too(tmp_path):
    """The C++ decoder sees the same hand-authored bytes (when built)."""
    from dcgan_sr_tpu.data import native
    if not native.available():
        pytest.skip("native lib not built")
    p = str(tmp_path / "gray51.png")
    write_png_rgb8(p, np.full((8, 8, 3), 0x33, np.uint8))
    out = native.load_image(p, nc=3, out_h=8, out_w=8)
    np.testing.assert_allclose(out, 51 / 255.0, atol=1e-6)


# ---- image.scale bilinear: hand-computed endpoint-aligned goldens ----------
def test_scale_bilinear_1d_upsample_hand_values():
    """[0,1,2,3] -> 7 wide: src pos = i*(4-1)/(7-1) = i*0.5 (hand-computed)."""
    x = np.arange(4, dtype=np.float32)[None]  # (1, 4)
    out = np.asarray(resize_bilinear(x, 1, 7))
    np.testing.assert_allclose(
        out[0], [0.0, 0.5, 1.0, 1.5, 2.0, 2.5, 3.0], atol=1e-6)


def test_scale_bilinear_corners_exact():
    """Endpoint alignment preserves all four corners exactly at any size."""
    img = np.array([[1.0, 2.0], [3.0, 4.0]], np.float32)
    out = np.asarray(resize_bilinear(img, 5, 5))
    assert out[0, 0] == 1.0 and out[0, -1] == 2.0
    assert out[-1, 0] == 3.0 and out[-1, -1] == 4.0
    # center of a bilinear surface between the corners: mean
    np.testing.assert_allclose(out[2, 2], 2.5, atol=1e-6)


def test_scale_bilinear_downsample_samples_grid():
    """5 -> 3 downscale: src pos = i*(5-1)/(3-1) = 0, 2, 4 — exact samples
    (torch7 image.scale bilinear does NOT antialias on downscale)."""
    row = np.array([10.0, 20.0, 30.0, 40.0, 50.0], np.float32)[None]
    out = np.asarray(resize_bilinear(row, 1, 3))
    np.testing.assert_allclose(out[0], [10.0, 30.0, 50.0], atol=1e-6)


def test_scale_bilinear_2d_hand_case():
    """3x3 ramp -> 5x5: every output is a hand-computable average."""
    img = np.arange(9, dtype=np.float32).reshape(3, 3)
    out = np.asarray(resize_bilinear(img, 5, 5))
    # src pos = i*0.5: positions 0, .5, 1, 1.5, 2
    expect = np.empty((5, 5), np.float32)
    pos = np.array([0.0, 0.5, 1.0, 1.5, 2.0])
    for a, ya in enumerate(pos):
        lo, fy = int(np.floor(ya)), ya - np.floor(ya)
        hi = min(lo + 1, 2)
        for b, xb in enumerate(pos):
            l2, fx = int(np.floor(xb)), xb - np.floor(xb)
            h2 = min(l2 + 1, 2)
            top = img[lo, l2] * (1 - fx) + img[lo, h2] * fx
            bot = img[hi, l2] * (1 - fx) + img[hi, h2] * fx
            expect[a, b] = top * (1 - fy) + bot * fy
    np.testing.assert_allclose(out, expect, atol=1e-6)


# ---- toDisplayTensor: hand-computed min-max + byte goldens -----------------
def test_to_display_minmax_and_bytes(tmp_path):
    """image.toDisplayTensor min-max rescales; saved bytes are
    round(x*255) with round-half-to-even: [0, .5, 1] -> [0, 128, 255];
    a constant tensor maps to 0 (test_tensor_to_image.lua's -1 fill saves
    as black)."""
    from dcgan_sr_tpu.image.io import save_display
    x = np.array([[-1.0, 0.0], [1.0, 1.0]], np.float32)
    disp = np.asarray(to_display(x))
    np.testing.assert_allclose(disp, [[0.0, 0.5], [1.0, 1.0]], atol=1e-7)
    p = str(tmp_path / "d.png")
    save_display(p, x)
    byte = load_image(p, nc=1, dtype="byte")[0]
    np.testing.assert_array_equal(byte, [[0, 128], [255, 255]])
    # constant input -> all zeros
    np.testing.assert_array_equal(
        np.asarray(to_display(np.full((3, 3), -0.5, np.float32))), 0.0)
