"""ctypes bindings for the native data-plane library (``native/``).

Auto-builds ``libpixparse_native.so`` with make/g++ on first import when
missing (cached thereafter); every entry point has a pure-Python/PIL fallback
so the framework works without a toolchain — the native path is a host-CPU
throughput optimization (libjpeg DCT-scaled decode, fused resize+pad+
normalize), not a hard dependency.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_logger = logging.getLogger(__name__)

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_SO_PATH = os.path.join(_NATIVE_DIR, "libpixparse_native.so")

_lib = None
_lib_lock = threading.Lock()
_build_attempted = False


def _configure(lib):
    i8p = ctypes.POINTER(ctypes.c_uint8)
    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int)
    lib.jpeg_probe.argtypes = [i8p, ctypes.c_int64, ctypes.c_int, ctypes.c_int, i32p, i32p, i32p]
    lib.jpeg_probe.restype = ctypes.c_int
    lib.jpeg_decode.argtypes = [i8p, ctypes.c_int64, ctypes.c_int, ctypes.c_int, i8p,
                                ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.jpeg_decode.restype = ctypes.c_int
    lib.png_probe.argtypes = [i8p, ctypes.c_int64, ctypes.c_int, i32p, i32p, i32p]
    lib.png_probe.restype = ctypes.c_int
    lib.png_decode.argtypes = [i8p, ctypes.c_int64, ctypes.c_int, i8p,
                               ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.png_decode.restype = ctypes.c_int
    lib.resize_bilinear_u8.argtypes = [i8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                                       i8p, ctypes.c_int, ctypes.c_int]
    lib.resize_bilinear_u8.restype = ctypes.c_int
    lib.resize_filter_u8.argtypes = [i8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                                     i8p, ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.resize_filter_u8.restype = ctypes.c_int
    lib.resize_pad_normalize_f32.argtypes = [
        i8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        f32p, f32p, ctypes.c_int,
    ]
    lib.resize_pad_normalize_f32.restype = ctypes.c_int
    return lib


def load_native():
    """Load (building if needed) the native library; None when unavailable."""
    global _lib, _build_attempted
    if _lib is not None:
        return _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_SO_PATH) and not _build_attempted:
            _build_attempted = True
            try:
                subprocess.run(
                    ["make", "-s"], cwd=_NATIVE_DIR, check=True,
                    capture_output=True, timeout=120,
                )
                _logger.info("built native library %s", _SO_PATH)
            except Exception as e:
                _logger.info("native library build unavailable: %s", e)
                return None
        if not os.path.exists(_SO_PATH):
            return None
        try:
            _lib = _configure(ctypes.CDLL(_SO_PATH))
        except AttributeError:
            # stale .so from an older source revision: rebuild once
            if _build_attempted:
                _logger.warning("native library stale and rebuild failed")
                return None
            _build_attempted = True
            try:
                subprocess.run(
                    ["make", "-s", "-B"], cwd=_NATIVE_DIR, check=True,
                    capture_output=True, timeout=120,
                )
                _lib = _configure(ctypes.CDLL(_SO_PATH))
                _logger.info("rebuilt stale native library %s", _SO_PATH)
            except Exception as e:
                _logger.warning("failed to rebuild stale native library: %s", e)
                return None
        except OSError as e:
            _logger.warning("failed to load native library: %s", e)
            return None
    return _lib


def native_available() -> bool:
    return load_native() is not None


def _u8p(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _f32p(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


_JPEG_MAGIC = b"\xff\xd8"
_PNG_MAGIC = b"\x89PNG"


def choose_jpeg_scale(full_h: int, full_w: int, target_h: int, target_w: int) -> int:
    """Largest libjpeg scale_denom in {1,2,4,8} keeping the decode >= target."""
    denom = 1
    for d in (2, 4, 8):
        if full_h // d >= target_h and full_w // d >= target_w:
            denom = d
    return denom


def decode_image(
    data: bytes,
    gray: bool = True,
    target_size: Optional[Tuple[int, int]] = None,
) -> Optional[np.ndarray]:
    """Decode JPEG/PNG bytes -> (H, W, C) uint8; None -> caller falls back to
    PIL. JPEGs with a ``target_size`` decode DCT-scaled (1/2..1/8)."""
    lib = load_native()
    if lib is None:
        return None
    buf = np.frombuffer(data, np.uint8)
    h = ctypes.c_int()
    w = ctypes.c_int()
    c = ctypes.c_int()
    want_gray = 1 if gray else 0
    if data[:2] == _JPEG_MAGIC:
        if lib.jpeg_probe(_u8p(buf), len(data), 1, want_gray,
                          ctypes.byref(h), ctypes.byref(w), ctypes.byref(c)):
            return None
        denom = 1
        if target_size is not None:
            denom = choose_jpeg_scale(h.value, w.value, *target_size)
        if denom != 1:
            if lib.jpeg_probe(_u8p(buf), len(data), denom, want_gray,
                              ctypes.byref(h), ctypes.byref(w), ctypes.byref(c)):
                return None
        out = np.empty((h.value, w.value, c.value), np.uint8)
        if lib.jpeg_decode(_u8p(buf), len(data), denom, want_gray,
                           _u8p(out), h.value, w.value, c.value):
            return None
        return out
    if data[:4] == _PNG_MAGIC:
        if lib.png_probe(_u8p(buf), len(data), want_gray,
                         ctypes.byref(h), ctypes.byref(w), ctypes.byref(c)):
            return None
        out = np.empty((h.value, w.value, c.value), np.uint8)
        if lib.png_decode(_u8p(buf), len(data), want_gray,
                          _u8p(out), h.value, w.value, c.value):
            return None
        return out
    return None


def resize_bilinear(img: np.ndarray, size: Tuple[int, int]) -> Optional[np.ndarray]:
    """(H, W, C) uint8 -> (h, w, C) uint8 bilinear; None -> fallback."""
    lib = load_native()
    if lib is None:
        return None
    img = np.ascontiguousarray(img, np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    dh, dw = size
    out = np.empty((dh, dw, img.shape[2]), np.uint8)
    if lib.resize_bilinear_u8(_u8p(img), img.shape[0], img.shape[1], img.shape[2],
                              _u8p(out), dh, dw):
        return None
    return out


_FILTER_IDS = {"bilinear": 0, "bicubic": 1}


def resize_filter(
    img: np.ndarray, size: Tuple[int, int], interpolation: str = "bicubic"
) -> Optional[np.ndarray]:
    """PIL-parity antialiased resize (bilinear/bicubic): uint8 (H, W[, C]) ->
    (h, w[, C]) uint8 matching PIL/torchvision ``resize`` within 1 grey level
    (float intermediate instead of PIL's uint8 mid-pass rounding). 2D in ->
    2D out. None -> caller falls back to PIL (other filters, no toolchain)."""
    fid = _FILTER_IDS.get(interpolation)
    if fid is None or img.dtype != np.uint8:
        return None
    lib = load_native()
    if lib is None:
        return None
    squeeze = img.ndim == 2
    img = np.ascontiguousarray(img, np.uint8)
    if squeeze:
        img = img[:, :, None]
    if img.ndim != 3:
        return None
    dh, dw = size
    out = np.empty((dh, dw, img.shape[2]), np.uint8)
    if lib.resize_filter_u8(_u8p(img), img.shape[0], img.shape[1], img.shape[2],
                            _u8p(out), dh, dw, fid):
        return None
    return out[:, :, 0] if squeeze else out


def resize_pad_normalize(
    img: np.ndarray,
    canvas: Tuple[int, int],
    resized: Tuple[int, int],
    mean,
    std,
    fill: int = 255,
) -> Optional[np.ndarray]:
    """Fused native path: uint8 (H, W, C) -> float32 (th, tw, C) normalized,
    image resized to ``resized`` in the top-left, remainder ``fill``."""
    lib = load_native()
    if lib is None:
        return None
    img = np.ascontiguousarray(img, np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    c = img.shape[2]
    th, tw = canvas
    rh, rw = resized
    mean_a = np.asarray(mean, np.float32).reshape(-1)
    std_a = np.asarray(std, np.float32).reshape(-1)
    if mean_a.size == 1 and c > 1:
        mean_a = np.repeat(mean_a, c)
        std_a = np.repeat(std_a, c)
    out = np.empty((th, tw, c), np.float32)
    rc = lib.resize_pad_normalize_f32(
        _u8p(img), img.shape[0], img.shape[1], c,
        _f32p(out), th, tw, rh, rw,
        _f32p(mean_a), _f32p(std_a), fill,
    )
    if rc:
        return None
    return out
