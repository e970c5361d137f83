"""Host-side image decode/encode with torch-`image` conventions.

Decode parity (probed by the reference's test_image_to_tensor.lua):
  image.load(path, nc, 'float') -> CHW float32 in [0,1]; 'byte' -> uint8 0-255.
  nc=1 on an RGB source converts via rgb2y (Rec.601 luma .299/.587/.114) — note
  this is DIFFERENT from the training-time rgb2gray (.21/.72/.07) the gray
  variant applies itself (train-gray.lua:55 comments on exactly this).

Encode parity (probed by test_tensor_to_image.lua): the reference always saves
through image.toDisplayTensor, which min-max rescales to [0,1] (constant
images -> 0, i.e. black); bytes are round(x*255).
"""

from __future__ import annotations

import numpy as np

from .ops import to_display

try:
    from PIL import Image as _PILImage
except ImportError:  # pragma: no cover
    _PILImage = None


def _require_pil():
    if _PILImage is None:  # pragma: no cover
        raise RuntimeError("PIL is required for host image decode/encode")


def load_image(path, nc=3, dtype="float"):
    """Decode to CHW; float32 [0,1] or uint8 per `dtype` ('float'|'byte')."""
    _require_pil()
    img = _PILImage.open(path)
    img = img.convert("RGB")
    arr = np.asarray(img, dtype=np.float32) / 255.0  # HWC
    chw = arr.transpose(2, 0, 1)
    if nc == 1:
        chw = (0.299 * chw[0] + 0.587 * chw[1] + 0.114 * chw[2])[None]
    elif nc != 3:
        raise ValueError(f"nc must be 1 or 3, got {nc}")
    if dtype == "byte":
        return np.clip(np.round(chw * 255.0), 0, 255).astype(np.uint8)
    return chw.astype(np.float32)


def save_image(path, arr, *, native="auto"):
    """Save [0,1] float HW / CHW / HWC to disk (round-to-nearest bytes).

    native="auto" routes PNG/JPEG encode through the C++ libpng/libjpeg
    encoders when built (make -C native; byte conversion bit-matches this
    PIL path — tested), making PIL optional for the sample-dump flow
    (train.lua:306-326).  native=False forces PIL; True requires the lib.
    """
    a = np.asarray(arr, np.float32)
    if a.ndim == 3 and a.shape[0] in (1, 3):  # CHW -> HWC
        a = a.transpose(1, 2, 0)
        if a.shape[-1] == 1:
            a = a[..., 0]
    if native != False:  # noqa: E712  (auto or True)
        from ..data import native as _native
        if _native.save_available():
            chw = a[None] if a.ndim == 2 else a.transpose(2, 0, 1)
            _native.save_image(path, chw)
            return
        if native is True:
            raise RuntimeError("native encoders not built (make -C native)")
    _require_pil()
    byte = np.clip(np.round(a * 255.0), 0, 255).astype(np.uint8)
    _PILImage.fromarray(byte).save(path)


def save_display(path, arr):
    """image.save(image.toDisplayTensor(x)) parity: min-max rescale then save."""
    a = np.asarray(to_display(np.asarray(arr, np.float32)))
    save_image(path, a)


def image_size(path):
    _require_pil()
    with _PILImage.open(path) as img:
        return img.size  # (W, H)
