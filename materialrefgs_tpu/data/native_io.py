"""ctypes bindings for the native fast-IO library (native/fastio.cpp).

Falls back to the pure-Python parsers (colmap_loader.py / utils/ply.py) when
the shared library has not been built. Build with `sh native/build.sh`
(auto-attempted once on first use).
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False


def _lib():
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    so = os.path.join(root, "native", "libfastio.so")
    if not os.path.exists(so):
        try:
            subprocess.run(
                ["sh", os.path.join(root, "native", "build.sh")],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    lib.fastio_last_error.restype = ctypes.c_char_p
    lib.fastio_free.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return _LIB


def _take(lib, ptr, count, ctype, nptype):
    arr = np.ctypeslib.as_array(
        ctypes.cast(ptr, ctypes.POINTER(ctype)), shape=(count,)
    ).astype(nptype, copy=True)
    lib.fastio_free(ptr)
    return arr


def read_points3d(path: str):
    """-> (xyz (N,3) f64, rgb (N,3) u8, err (N,) f64) or None on fallback."""
    lib = _lib()
    if lib is None:
        return None
    xyz_p = ctypes.c_void_p()
    rgb_p = ctypes.c_void_p()
    err_p = ctypes.c_void_p()
    lib.fastio_read_points3d.restype = ctypes.c_int64
    n = lib.fastio_read_points3d(
        path.encode(), ctypes.byref(xyz_p), ctypes.byref(rgb_p), ctypes.byref(err_p)
    )
    if n < 0:
        return None
    xyz = _take(lib, xyz_p, n * 3, ctypes.c_double, np.float64).reshape(n, 3)
    rgb = _take(lib, rgb_p, n * 3, ctypes.c_uint8, np.uint8).reshape(n, 3)
    err = _take(lib, err_p, n, ctypes.c_double, np.float64)
    return xyz, rgb, err


def read_images(path: str):
    """-> (qvec (N,4), tvec (N,3), camera_id (N,), names list) or None."""
    lib = _lib()
    if lib is None:
        return None
    qv = ctypes.c_void_p()
    tv = ctypes.c_void_p()
    cid = ctypes.c_void_p()
    names = ctypes.c_void_p()
    nlen = ctypes.c_int64()
    lib.fastio_read_images.restype = ctypes.c_int64
    n = lib.fastio_read_images(
        path.encode(), ctypes.byref(qv), ctypes.byref(tv), ctypes.byref(cid),
        ctypes.byref(names), ctypes.byref(nlen),
    )
    if n < 0:
        return None
    qvec = _take(lib, qv, n * 4, ctypes.c_double, np.float64).reshape(n, 4)
    tvec = _take(lib, tv, n * 3, ctypes.c_double, np.float64).reshape(n, 3)
    camid = _take(lib, cid, n, ctypes.c_int32, np.int32)
    raw = ctypes.string_at(names, nlen.value)
    lib.fastio_free(names)
    try:
        name_list = raw.decode("utf-8").split("\0")[:n]
    except UnicodeDecodeError:
        return None  # exotic encoding: fall back to the Python parser
    return qvec, tvec, camid, name_list


def read_ply_f32(path: str):
    """All-float binary PLY -> dict {prop: (N,) f32} or None."""
    lib = _lib()
    if lib is None:
        return None
    data = ctypes.c_void_p()
    ncols = ctypes.c_int64()
    names = ctypes.c_void_p()
    nlen = ctypes.c_int64()
    lib.fastio_read_ply_f32.restype = ctypes.c_int64
    n = lib.fastio_read_ply_f32(
        path.encode(), ctypes.byref(data), ctypes.byref(ncols),
        ctypes.byref(names), ctypes.byref(nlen),
    )
    if n < 0:
        return None
    C = ncols.value
    arr = _take(lib, data, n * C, ctypes.c_float, np.float32).reshape(n, C)
    raw = ctypes.string_at(names, nlen.value)
    lib.fastio_free(names)
    props = raw.decode("ascii").split("\0")[:C]
    return {p: np.ascontiguousarray(arr[:, i]) for i, p in enumerate(props)}
