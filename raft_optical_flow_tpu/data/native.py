"""ctypes bindings for the native data-plane (native/flowdata.cpp).

Compiles the shared library on first use (g++ -O3, cached next to the source) and
exposes decoders with the same signatures as data/frame_utils.py. Every entry point
has a pure-Python fallback, so the package works without a toolchain; when the
library is present, decoding runs in C++ threads entirely outside the GIL.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_SRC = os.path.join(_NATIVE_DIR, "flowdata.cpp")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libflowdata.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        "-o", _LIB_PATH, _SRC, "-lpthread",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_LIB_PATH)
        ):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None

        c_char_pp = ctypes.POINTER(ctypes.c_char_p)
        i32p = ctypes.POINTER(ctypes.c_int32)
        f32p = ctypes.POINTER(ctypes.c_float)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.flo_dims.argtypes = [ctypes.c_char_p, i32p, i32p]
        lib.flo_read.argtypes = [ctypes.c_char_p, f32p, ctypes.c_int64]
        lib.flo_read_batch.argtypes = [
            c_char_pp, ctypes.c_int32, f32p, ctypes.c_int64, ctypes.c_int32,
        ]
        lib.ppm_dims.argtypes = [ctypes.c_char_p, i32p, i32p]
        lib.ppm_read.argtypes = [ctypes.c_char_p, u8p, ctypes.c_int64]
        lib.pfm_dims.argtypes = [ctypes.c_char_p, i32p, i32p, i32p]
        lib.pfm_read.argtypes = [ctypes.c_char_p, f32p, ctypes.c_int64]
        _lib = lib
        return _lib


def native_available() -> bool:
    return get_lib() is not None


def read_flow_native(path: str) -> Optional[np.ndarray]:
    """Middlebury .flo -> [H, W, 2] float32, or None if native path unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    w = ctypes.c_int32()
    h = ctypes.c_int32()
    if lib.flo_dims(path.encode(), ctypes.byref(w), ctypes.byref(h)) != 0:
        raise ValueError(f"{path}: invalid .flo file")
    out = np.empty((h.value, w.value, 2), np.float32)
    rc = lib.flo_read(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), out.size
    )
    if rc != 0:
        raise ValueError(f"{path}: .flo read failed ({rc})")
    return out


def read_flow_batch_native(
    paths: List[str], num_threads: int = 4
) -> Optional[np.ndarray]:
    """Decode same-size .flo files in parallel -> [N, H, W, 2], or None."""
    lib = get_lib()
    if lib is None or not paths:
        return None
    w = ctypes.c_int32()
    h = ctypes.c_int32()
    if lib.flo_dims(paths[0].encode(), ctypes.byref(w), ctypes.byref(h)) != 0:
        raise ValueError(f"{paths[0]}: invalid .flo file")
    n = len(paths)
    out = np.empty((n, h.value, w.value, 2), np.float32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    rc = lib.flo_read_batch(
        arr, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out[0].size, num_threads,
    )
    if rc != 0:
        raise ValueError(f".flo batch read failed ({rc})")
    return out


def read_ppm_native(path: str) -> Optional[np.ndarray]:
    """Binary PPM (P6) -> [H, W, 3] uint8, or None."""
    lib = get_lib()
    if lib is None:
        return None
    w = ctypes.c_int32()
    h = ctypes.c_int32()
    if lib.ppm_dims(path.encode(), ctypes.byref(w), ctypes.byref(h)) != 0:
        raise ValueError(f"{path}: invalid PPM file")
    out = np.empty((h.value, w.value, 3), np.uint8)
    rc = lib.ppm_read(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), out.size
    )
    if rc != 0:
        raise ValueError(f"{path}: PPM read failed ({rc})")
    return out


def read_pfm_native(path: str) -> Optional[np.ndarray]:
    """PFM -> [H, W] or [H, W, 3] float32 top-down, or None."""
    lib = get_lib()
    if lib is None:
        return None
    w = ctypes.c_int32()
    h = ctypes.c_int32()
    c = ctypes.c_int32()
    if lib.pfm_dims(path.encode(), ctypes.byref(w), ctypes.byref(h), ctypes.byref(c)) != 0:
        raise ValueError(f"{path}: invalid PFM file")
    shape = (h.value, w.value, 3) if c.value == 3 else (h.value, w.value)
    out = np.empty(shape, np.float32)
    rc = lib.pfm_read(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), out.size
    )
    if rc != 0:
        raise ValueError(f"{path}: PFM read failed ({rc})")
    return out
