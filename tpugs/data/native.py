"""ctypes bindings for the native (C++) data layer — native/colmap_io.cpp.

Auto-builds native/libtpugs_native.so with g++ on first use; every entry point
falls back to the pure-Python implementation if the toolchain or library is
unavailable, so the native path is an accelerator, never a requirement.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libtpugs_native.so"))

_lock = threading.Lock()
_lib = None
_lib_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _lib_failed
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        if not os.path.exists(_LIB_PATH):
            src = os.path.join(os.path.dirname(_LIB_PATH), "colmap_io.cpp")
            if not os.path.exists(src):
                _lib_failed = True
                return None
            try:
                subprocess.run(
                    ["g++", "-O3", "-fPIC", "-shared", "-std=c++17",
                     "-o", _LIB_PATH, src],
                    check=True, capture_output=True, timeout=120,
                )
            except Exception:
                _lib_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _lib_failed = True
            return None

        lib.tpugs_free.argtypes = [ctypes.c_void_p]
        lib.tpugs_parse_points3d.restype = ctypes.c_int64
        lib.tpugs_parse_points3d.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_double)),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ]
        lib.tpugs_parse_cameras.restype = ctypes.c_int64
        lib.tpugs_parse_cameras.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_double)),
        ]
        lib.tpugs_parse_images.restype = ctypes.c_int64
        lib.tpugs_parse_images.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_double)),
            ctypes.POINTER(ctypes.c_char_p),
        ]
        lib.tpugs_write_gaussian_ply.restype = ctypes.c_int
        lib.tpugs_write_gaussian_ply.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int,
        ] + [np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")] * 5
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def parse_points3d(path: str):
    """-> (xyz [n,3] f64, rgb [n,3] u8) or None if native unavailable."""
    lib = _load()
    if lib is None:
        return None
    xyz_p = ctypes.POINTER(ctypes.c_double)()
    rgb_p = ctypes.POINTER(ctypes.c_uint8)()
    n = lib.tpugs_parse_points3d(path.encode(), ctypes.byref(xyz_p),
                                 ctypes.byref(rgb_p))
    if n < 0:
        return None
    xyz = np.ctypeslib.as_array(xyz_p, shape=(n, 3)).copy()
    rgb = np.ctypeslib.as_array(rgb_p, shape=(n, 3)).copy()
    lib.tpugs_free(xyz_p)
    lib.tpugs_free(rgb_p)
    return xyz, rgb


def parse_cameras(path: str):
    """-> records [n,12] f64 (camera_id, model_id, w, h, params[8]) or None."""
    lib = _load()
    if lib is None:
        return None
    rec_p = ctypes.POINTER(ctypes.c_double)()
    n = lib.tpugs_parse_cameras(path.encode(), ctypes.byref(rec_p))
    if n < 0:
        return None
    rec = np.ctypeslib.as_array(rec_p, shape=(n, 12)).copy()
    lib.tpugs_free(rec_p)
    return rec


def parse_images(path: str):
    """-> (records [n,9] f64, names list[str]) or None."""
    lib = _load()
    if lib is None:
        return None
    rec_p = ctypes.POINTER(ctypes.c_double)()
    names_p = ctypes.c_char_p()
    n = lib.tpugs_parse_images(path.encode(), ctypes.byref(rec_p),
                               ctypes.byref(names_p))
    if n < 0:
        return None
    rec = np.ctypeslib.as_array(rec_p, shape=(n, 9)).copy()
    names = names_p.value.decode("utf-8").split("\n")[:n]
    lib.tpugs_free(rec_p)
    lib.tpugs_free(ctypes.cast(names_p, ctypes.c_void_p))
    return rec, names


def write_gaussian_ply(path: str, means, sh, opacity_logits, log_scales, quats) -> bool:
    """Native PLY write; returns False if unavailable (caller falls back)."""
    lib = _load()
    if lib is None:
        return False
    means = np.ascontiguousarray(means, np.float32)
    sh = np.ascontiguousarray(sh, np.float32)
    op = np.ascontiguousarray(opacity_logits, np.float32).reshape(-1)
    scales = np.ascontiguousarray(log_scales, np.float32)
    quats = np.ascontiguousarray(quats, np.float32)
    n, _, c = sh.shape
    rc = lib.tpugs_write_gaussian_ply(
        path.encode(), n, c, means, sh.reshape(n, -1), op, scales, quats
    )
    return rc == 0
