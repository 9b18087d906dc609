"""ctypes binding for the native area-downsample kernel (resize.cpp).

Builds the shared library on first use (g++ -O3, cached next to the source);
raises ImportError when no toolchain is available so callers (data/llff.py)
can fall back to the numpy implementation.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "resize.cpp")
_SO = os.path.join(_DIR, "_resize.so")
_lock = threading.Lock()
_lib = None


def _build() -> str:
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-pthread",
           "-o", _SO, _SRC]
    subprocess.run(cmd, check=True, capture_output=True)
    return _SO


def _load():
    global _lib
    with _lock:
        if _lib is None:
            lib = ctypes.CDLL(_build())
            for name, in_t in (
                ("area_downsample_u8", ctypes.c_uint8),
                ("area_downsample_f32", ctypes.c_float),
            ):
                fn = getattr(lib, name)
                fn.argtypes = [
                    ctypes.POINTER(in_t),
                    ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                    ctypes.POINTER(ctypes.c_float),
                ]
                fn.restype = None
            lib.lanczos_resize_f32.argtypes = [
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_float),
            ]
            lib.lanczos_resize_f32.restype = None
            _lib = lib
    return _lib


def area_downsample(img: np.ndarray, factor: int) -> np.ndarray:
    """Block-mean downsample img [H, W, C] (or [H, W]) by an integer factor.

    uint8 input -> float32 in [0, 255]; float input -> float32 same scale.
    """
    lib = _load()
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    H, W, C = img.shape
    H2, W2 = H // factor, W // factor
    out = np.empty((H2, W2, C), np.float32)
    if img.dtype == np.uint8:
        src = np.ascontiguousarray(img)
        lib.area_downsample_u8(
            src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            H, W, C, factor,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
    else:
        src = np.ascontiguousarray(img, dtype=np.float32)
        lib.area_downsample_f32(
            src.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            H, W, C, factor,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
    return out[..., 0] if squeeze else out


def lanczos_resize(img: np.ndarray, H2: int, W2: int) -> np.ndarray:
    """Lanczos-3 resample img [H, W, C] (or [H, W]) to (H2, W2) — the filter
    ImageMagick's default `-resize` uses when minifying (ref load_llff.py:45).

    Input any float/uint8 scale; output float32 in the same scale (not
    clamped; Lanczos overshoots by design, callers clip if needed).
    """
    lib = _load()
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    H, W, C = img.shape
    src = np.ascontiguousarray(img, dtype=np.float32)
    out = np.empty((H2, W2, C), np.float32)
    lib.lanczos_resize_f32(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        H, W, C, H2, W2,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out[..., 0] if squeeze else out
