"""ctypes bindings for the native C++ data path (native/dataio.cpp).

Drop-in accelerated decode/resize for the indexed loader: N C++ threads decode
libjpeg/libpng directly into a preallocated batch buffer — the reference's
donkey-pool + `image` C library, without the Lua layer.  Falls back cleanly
when the shared library hasn't been built (`make -C native`).
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_LIB_PATHS = [
    os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "native", "libdcgansr.so"),
]


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    for p in _LIB_PATHS:
        if os.path.isfile(p):
            lib = ctypes.CDLL(p)
            lib.dsr_load_image.restype = ctypes.c_int
            lib.dsr_load_image.argtypes = [
                ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_float)]
            lib.dsr_loader_create.restype = ctypes.c_void_p
            lib.dsr_loader_create.argtypes = [
                ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_int]
            lib.dsr_loader_load_batch.restype = ctypes.c_int
            lib.dsr_loader_load_batch.argtypes = [
                ctypes.c_void_p, ctypes.c_longlong,
                ctypes.POINTER(ctypes.c_float)]
            lib.dsr_loader_destroy.argtypes = [ctypes.c_void_p]
            lib.dsr_index_dir.restype = ctypes.c_longlong
            lib.dsr_index_dir.argtypes = [
                ctypes.c_char_p, ctypes.c_char_p, ctypes.c_longlong]
            try:
                lib.dsr_save_png.restype = ctypes.c_int
                lib.dsr_save_png.argtypes = [
                    ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
                    ctypes.c_int, ctypes.c_int, ctypes.c_int]
                lib.dsr_save_jpeg.restype = ctypes.c_int
                lib.dsr_save_jpeg.argtypes = [
                    ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
                    ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int]
            except AttributeError:  # older .so without encoders
                pass
            _LIB = lib
            return lib
    return None


def available() -> bool:
    return _load() is not None


def load_image(path, nc=1, out_h=64, out_w=64):
    """Decode+resize one image natively -> (nc, out_h, out_w) float32 [0,1]."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not built (make -C native)")
    out = np.empty((nc, out_h, out_w), np.float32)
    rc = lib.dsr_load_image(path.encode(), nc, out_h, out_w,
                            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if rc != 0:
        raise IOError(f"native decode failed for {path}")
    return out


def save_available() -> bool:
    lib = _load()
    return lib is not None and hasattr(lib, "dsr_save_png")


def save_image(path, chw, quality=95):
    """Encode float32 CHW [0,1] (c=1 gray / c=3 RGB) natively.

    PNG or JPEG chosen by extension; byte conversion (round-half-to-even,
    clamp) bit-matches image/io.py's PIL path."""
    lib = _load()
    if lib is None or not hasattr(lib, "dsr_save_png"):
        raise RuntimeError("native encoders not built (make -C native)")
    a = np.ascontiguousarray(chw, np.float32)
    if a.ndim == 2:
        a = a[None]
    c, h, w = a.shape
    ptr = a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    ext = os.path.splitext(path)[1].lower()
    if ext in (".jpg", ".jpeg"):
        rc = lib.dsr_save_jpeg(path.encode(), ptr, c, h, w, quality)
    else:
        rc = lib.dsr_save_png(path.encode(), ptr, c, h, w)
    if rc != 0:
        raise IOError(f"native encode failed for {path}")


def index_dir(root):
    """Recursive native directory walk -> sorted list of image paths."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not built (make -C native)")
    need = lib.dsr_index_dir(root.encode(), None, 0)
    if need <= 0:
        return []
    buf = ctypes.create_string_buffer(int(need))
    lib.dsr_index_dir(root.encode(), buf, need)
    # the C walk sorts entries per directory but pops its stack LIFO, so the
    # concatenated order is not globally sorted — sort here to honor the
    # documented contract (deterministic index -> file mapping)
    return sorted(buf.raw[:need].decode().splitlines())


class NativeIndexedLoader:
    """Native-threaded sequential indexed loader (IndexedCelebA-compatible)."""

    def __init__(self, route, fine_size=64, nc=1, n_threads=8):
        lib = _load()
        if lib is None:
            raise RuntimeError("native library not built (make -C native)")
        self._lib = lib
        self.route = route
        self.fine_size = fine_size
        self.nc = nc
        self._handles = {}
        self._n_threads = n_threads

    def _handle(self, batch_size):
        h = self._handles.get(batch_size)
        if h is None:
            h = self._lib.dsr_loader_create(
                self.route.encode(), self.nc, self.fine_size, batch_size,
                self._n_threads)
            if not h:  # NULL c_void_p: fail loudly, not with a C segfault
                raise RuntimeError(
                    f"dsr_loader_create failed (route={self.route!r}, "
                    f"nc={self.nc}, batch={batch_size})")
            self._handles[batch_size] = h
        return h

    def exists(self):
        from .indexed import celeba_path
        return os.path.isfile(celeba_path(self.route, 1))

    def load_one(self, file_num):
        from .indexed import celeba_path
        return load_image(celeba_path(self.route, file_num), self.nc,
                          self.fine_size, self.fine_size)

    def load_batch(self, file_set_num, batch_size):
        out = np.empty((batch_size, self.nc, self.fine_size, self.fine_size),
                       np.float32)
        ok = self._lib.dsr_loader_load_batch(
            self._handle(batch_size), file_set_num,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        if ok < batch_size:
            raise IOError(f"{batch_size - ok} images failed to decode in "
                          f"file_set {file_set_num}")
        return out

    def close(self):
        for h in self._handles.values():
            self._lib.dsr_loader_destroy(h)
        self._handles.clear()
