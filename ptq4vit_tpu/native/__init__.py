"""Native (C++) data plane: JPEG decode + Pillow-bit-exact bicubic resize +
crop + normalize, bound via ctypes (no pybind11 in this image).

Compiled on demand with g++ against the system libjpeg; everything degrades
gracefully to the PIL path when the toolchain or libjpeg is missing
(``available()`` -> False).  ctypes calls release the GIL, so the loader's
thread pool scales across cores.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "preprocess.cpp")
_SO = os.path.join(_HERE, "libptq4vitpp.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-march=native", "-funroll-loops", "-shared",
           "-fPIC", "-std=c++17", _SRC, "-ljpeg", "-o", _SO]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or \
                os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        u8p = ctypes.POINTER(ctypes.c_uint8)
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.pp_decode_preprocess.argtypes = [
            u8p, ctypes.c_size_t, ctypes.c_int, ctypes.c_int, f32p, f32p,
            f32p]
        lib.pp_decode_preprocess.restype = ctypes.c_int
        lib.pp_preprocess_rgb.argtypes = [
            u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            f32p, f32p, f32p]
        lib.pp_preprocess_rgb.restype = ctypes.c_int
        lib.pp_resize.argtypes = [u8p, ctypes.c_int, ctypes.c_int,
                                  ctypes.c_int, ctypes.c_int, u8p]
        lib.pp_resize.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _fptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _u8ptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def decode_preprocess(jpeg_bytes: bytes, scale_size: int, crop: int,
                      mean, std) -> np.ndarray:
    """JPEG bytes -> normalized float32 CHW (crop x crop)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native preprocess unavailable")
    buf = np.frombuffer(jpeg_bytes, np.uint8)
    out = np.empty((3, crop, crop), np.float32)
    m = np.ascontiguousarray(mean, np.float32).reshape(3)
    s = np.ascontiguousarray(std, np.float32).reshape(3)
    rc = lib.pp_decode_preprocess(_u8ptr(buf), buf.size, scale_size, crop,
                                  _fptr(m), _fptr(s), _fptr(out))
    if rc != 0:
        raise ValueError(f"native preprocess failed (rc={rc})")
    return out


def preprocess_rgb(rgb: np.ndarray, scale_size: int, crop: int,
                   mean, std) -> np.ndarray:
    """HWC uint8 RGB -> normalized float32 CHW (crop x crop)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native preprocess unavailable")
    rgb = np.ascontiguousarray(rgb, np.uint8)
    h, w, _ = rgb.shape
    out = np.empty((3, crop, crop), np.float32)
    m = np.ascontiguousarray(mean, np.float32).reshape(3)
    s = np.ascontiguousarray(std, np.float32).reshape(3)
    rc = lib.pp_preprocess_rgb(_u8ptr(rgb), w, h, scale_size, crop,
                               _fptr(m), _fptr(s), _fptr(out))
    if rc != 0:
        raise ValueError(f"native preprocess failed (rc={rc})")
    return out


def resize_bicubic(rgb: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Pillow-bit-exact bicubic resize of an HWC uint8 RGB image."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native preprocess unavailable")
    rgb = np.ascontiguousarray(rgb, np.uint8)
    h, w, _ = rgb.shape
    out = np.empty((out_h, out_w, 3), np.uint8)
    lib.pp_resize(_u8ptr(rgb), w, h, out_w, out_h, _u8ptr(out))
    return out
