"""ctypes binding + on-demand build of the native window loader.

The C++ core (loader.cc) does threaded JPEG/16-bit-PNG decode, bilinear
resize, and pose parsing for a whole training window in one call — the
native equivalent of the host-side work the reference runs through torch
DataLoader workers + cv2 (data/scannet.py:97-164).

`available()` is False (and everything falls back to the cv2 path) when the
toolchain or codec libraries are missing; nothing else in the package
depends on this module being importable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "loader.cc")
_LIB_PATH = os.path.join(_DIR, "libestloader.so")

_lib = None
_lib_lock = threading.Lock()
_build_error: Optional[str] = None


def _build() -> Optional[str]:
    """Compile the shared library; returns an error string or None."""
    cmd = [
        "g++", "-O3", "-fPIC", "-shared", "-std=c++17", _SRC,
        "-o", _LIB_PATH, "-ljpeg", "-lpng", "-lz", "-pthread",
    ]
    try:
        proc = subprocess.run(
            cmd, capture_output=True, text=True, timeout=120
        )
    except (OSError, subprocess.TimeoutExpired) as e:  # no toolchain
        return str(e)
    if proc.returncode != 0:
        return proc.stderr[-2000:]
    return None


def _load():
    global _lib, _build_error
    with _lib_lock:
        if _lib is not None or _build_error is not None:
            return _lib
        if not os.path.exists(_LIB_PATH) or (
            os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)
        ):
            _build_error = _build()
            if _build_error is not None:
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError as e:
            _build_error = str(e)
            return None
        fp = ctypes.POINTER(ctypes.c_float)
        lib.est_decode_jpeg_resize.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, fp,
        ]
        lib.est_decode_png16_resize.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, fp,
        ]
        lib.est_load_pose.argtypes = [ctypes.c_char_p, fp]
        lib.est_load_window.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, fp, fp, fp,
        ]
        for fn in ("est_decode_jpeg_resize", "est_decode_png16_resize",
                   "est_load_pose", "est_load_window"):
            getattr(lib, fn).restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def build_error() -> Optional[str]:
    _load()
    return _build_error


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def read_image_rgb(path: str, width: int, height: int) -> np.ndarray:
    lib = _load()
    out = np.empty((height, width, 3), np.float32)
    rc = lib.est_decode_jpeg_resize(path.encode(), width, height, _fptr(out))
    if rc != 0:
        raise IOError(f"native jpeg decode failed ({rc}): {path}")
    return out


def read_depth_m(path: str, width: int, height: int) -> np.ndarray:
    lib = _load()
    out = np.empty((height, width), np.float32)
    rc = lib.est_decode_png16_resize(path.encode(), width, height, _fptr(out))
    if rc != 0:
        raise IOError(f"native png decode failed ({rc}): {path}")
    return out


def read_pose(path: str) -> np.ndarray:
    lib = _load()
    out = np.empty((4, 4), np.float32)
    rc = lib.est_load_pose(path.encode(), _fptr(out))
    if rc != 0:
        raise IOError(f"native pose read failed ({rc}): {path}")
    return out


def read_window(
    img_paths: List[str],
    depth_paths: List[str],
    pose_paths: List[str],
    width: int,
    height: int,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Threaded whole-window load: (imgs [N,H,W,3], depths_m [N,H,W],
    poses [N,4,4])."""
    lib = _load()
    n = len(img_paths)
    imgs = np.empty((n, height, width, 3), np.float32)
    depths = np.empty((n, height, width), np.float32)
    poses = np.empty((n, 4, 4), np.float32)

    def carr(paths):
        arr = (ctypes.c_char_p * n)()
        arr[:] = [p.encode() for p in paths]
        return arr

    rc = lib.est_load_window(
        carr(img_paths), carr(depth_paths), carr(pose_paths), n,
        width, height, _fptr(imgs), _fptr(depths), _fptr(poses),
    )
    if rc != 0:
        raise IOError(f"native window load failed ({rc})")
    return imgs, depths, poses
