"""ctypes bindings for the native host ops, with transparent fallback.

Compiles host_ops.cpp on first import (g++ -O3, cached next to the source);
if no toolchain is available the callers keep their numpy paths. Disable
explicitly with RVT_NATIVE=0.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_HERE = Path(__file__).resolve().parent
_SRC = _HERE / "host_ops.cpp"
_LIB = _HERE / "libhostops.so"
_JPEG_SRC = _HERE / "jpeg_enc.cpp"
_JPEG_LIB = _HERE / "libjpegenc.so"
_JDEC_SRC = _HERE / "jpeg_dec.cpp"
_JDEC_LIB = _HERE / "libjpegdec.so"

_lib: Optional[ctypes.CDLL] = None
_jpeg_lib = None  # None = untried, False = unavailable
_jdec_lib = None  # None = untried, False = unavailable


def _compile(src: Path, lib: Path, extra=()) -> Optional[ctypes.CDLL]:
    if os.environ.get("RVT_NATIVE", "1") == "0":
        return None
    try:
        if (not lib.exists()
                or lib.stat().st_mtime < src.stat().st_mtime):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", str(src),
                 "-o", str(lib), *extra],
                check=True, capture_output=True, timeout=120)
        return ctypes.CDLL(str(lib))
    except Exception:
        return None


def _build() -> Optional[ctypes.CDLL]:
    return _compile(_SRC, _LIB)


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is None:
        _lib = _build()
        if _lib is not None:
            _declare(_lib)
    return _lib


def _declare(lib: ctypes.CDLL) -> None:
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.rvt_fill_rect.argtypes = [u8p] + [ctypes.c_int] * 6 \
        + [ctypes.c_uint8] * 3
    lib.rvt_draw_rect.argtypes = [u8p] + [ctypes.c_int] * 7 \
        + [ctypes.c_uint8] * 3
    lib.rvt_blit_mask.argtypes = [u8p, ctypes.c_int, ctypes.c_int, u8p,
                                  ctypes.c_int, ctypes.c_int, ctypes.c_int,
                                  ctypes.c_int] + [ctypes.c_uint8] * 3
    lib.rvt_canvas_h.argtypes = [u8p, u8p, u8p] + [ctypes.c_int] * 3
    lib.rvt_canvas_v.argtypes = [u8p, u8p, u8p] + [ctypes.c_int] * 3


def _ptr(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def available() -> bool:
    return get_lib() is not None


def get_jpeg_lib():
    """libjpeg-turbo encode tail; False when -ljpeg is unavailable."""
    global _jpeg_lib
    if _jpeg_lib is None:
        lib = _compile(_JPEG_SRC, _JPEG_LIB, extra=("-ljpeg",))
        if lib is not None:
            lib.rvt_jpeg_encode_bgr.restype = ctypes.c_long
            lib.rvt_jpeg_encode_bgr.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
                ctypes.c_long, ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))]
            lib.rvt_jpeg_free.argtypes = [ctypes.POINTER(ctypes.c_uint8)]
        _jpeg_lib = lib if lib is not None else False
    return _jpeg_lib


def jpeg_encode_bgr(frame: np.ndarray, quality: int = 90,
                    fast_dct: bool = True) -> Optional[bytes]:
    """JPEG-encode an (h, w, 3) uint8 BGR frame; None if unavailable."""
    lib = get_jpeg_lib()
    if not lib:
        return None
    arr = np.ascontiguousarray(frame)
    h, w = arr.shape[:2]
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = lib.rvt_jpeg_encode_bgr(_ptr(arr), h, w, arr.strides[0],
                                int(quality), int(bool(fast_dct)),
                                ctypes.byref(out))
    if n < 0:
        return None
    try:
        return ctypes.string_at(out, n)
    finally:
        lib.rvt_jpeg_free(out)


def get_jdec_lib():
    """libjpeg-turbo decode path; False when -ljpeg is unavailable."""
    global _jdec_lib
    if _jdec_lib is None:
        lib = _compile(_JDEC_SRC, _JDEC_LIB, extra=("-ljpeg",))
        if lib is not None:
            lib.rvt_jpeg_decode_bgr.restype = ctypes.c_long
            lib.rvt_jpeg_decode_bgr.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))]
            lib.rvt_jpeg_free_dec.argtypes = [ctypes.POINTER(ctypes.c_uint8)]
        _jdec_lib = lib if lib is not None else False
    return _jdec_lib


def jpeg_decode_bgr(data: bytes) -> Optional[np.ndarray]:
    """Decode a JPEG byte stream to (h, w, 3) uint8 BGR; None when the
    native path is unavailable or the stream does not decode."""
    lib = get_jdec_lib()
    if not lib:
        return None
    src = (ctypes.c_uint8 * len(data)).from_buffer_copy(data)
    h = ctypes.c_int()
    w = ctypes.c_int()
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = lib.rvt_jpeg_decode_bgr(src, len(data), ctypes.byref(h),
                                ctypes.byref(w), ctypes.byref(out))
    if n < 0:
        return None
    try:
        view = np.ctypeslib.as_array(out, shape=(h.value, w.value, 3))
        return view.copy()  # own the memory before freeing the C buffer
    finally:
        lib.rvt_jpeg_free_dec(out)


def fill_rect(img: np.ndarray, x1: int, y1: int, x2: int, y2: int, color):
    lib = get_lib()
    assert lib is not None and img.flags["C_CONTIGUOUS"]
    h, w = img.shape[:2]
    b, g, r = (int(c) & 0xFF for c in color)
    lib.rvt_fill_rect(_ptr(img), h, w, int(x1), int(y1), int(x2), int(y2),
                      b, g, r)


def draw_rect(img: np.ndarray, x1: int, y1: int, x2: int, y2: int,
              color, thickness: int = 2):
    lib = get_lib()
    assert lib is not None and img.flags["C_CONTIGUOUS"]
    h, w = img.shape[:2]
    b, g, r = (int(c) & 0xFF for c in color)
    lib.rvt_draw_rect(_ptr(img), h, w, int(x1), int(y1), int(x2), int(y2),
                      int(thickness), b, g, r)


def blit_mask(img: np.ndarray, mask: np.ndarray, x: int, y: int, color):
    lib = get_lib()
    assert lib is not None and img.flags["C_CONTIGUOUS"]
    h, w = img.shape[:2]
    m = np.ascontiguousarray(mask.astype(np.uint8))
    b, g, r = (int(c) & 0xFF for c in color)
    lib.rvt_blit_mask(_ptr(img), h, w, _ptr(m), m.shape[0], m.shape[1],
                      int(x), int(y), b, g, r)


def canvas(raw: np.ndarray, proc: np.ndarray, layout: str = "h",
           divider: int = 4) -> np.ndarray:
    lib = get_lib()
    assert lib is not None
    h, w = raw.shape[:2]
    raw = np.ascontiguousarray(raw)
    proc = np.ascontiguousarray(proc)
    if layout == "v":
        out = np.empty((2 * h + divider, w, 3), np.uint8)
        lib.rvt_canvas_v(_ptr(raw), _ptr(proc), _ptr(out), h, w, divider)
    else:
        out = np.empty((h, 2 * w + divider, 3), np.uint8)
        lib.rvt_canvas_h(_ptr(raw), _ptr(proc), _ptr(out), h, w, divider)
    return out
