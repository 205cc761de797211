"""Host-side image/pose IO helpers shared by the dataset readers.

Keeps cv2 usage in one place (identical resize semantics matter for parity:
cv2.resize default INTER_LINEAR, used by the reference for both rgb and
train-mode depth, data/scannet.py:121,137).
"""

from __future__ import annotations

import os
import re
from typing import List

import numpy as np

try:
    import cv2

    HAVE_CV2 = True
except Exception:  # pragma: no cover
    cv2 = None
    HAVE_CV2 = False


def natsorted(paths: List[str]) -> List[str]:
    """Natural sort (numeric-aware), replacing the natsort dependency."""

    def key(s):
        return [int(t) if t.isdigit() else t for t in re.split(r"(\d+)", s)]

    return sorted(paths, key=key)


def read_image_rgb(
    path: str, width: int, height: int, dtype=np.float32
) -> np.ndarray:
    """BGR jpg -> resized RGB [H, W, 3] in 0..255 (data/scannet.py:115-124).

    The decode + resize + color-convert chain runs entirely in uint8 (the
    reference's does too — general_eval_seq.py:184-204 casts to float only
    at tensor conversion), so values are exact integers either way.
    `dtype=np.uint8` skips the final cast: the eval datasets ship uint8 to
    keep the host->device frame upload at 1/4 the float32 bytes (the
    models cast on device — bit-identical results)."""
    img = cv2.imread(path)
    if img is None:
        raise IOError(f"failed to read image {path}")
    img = cv2.resize(img, (width, height))
    img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    return img if dtype == np.uint8 else img.astype(dtype)


def read_depth_mm(
    path: str, width: int = None, height: int = None
) -> np.ndarray:
    """16-bit png depth in mm -> float32 meters; optional resize
    (data/scannet.py:136-142)."""
    depth = cv2.imread(path, cv2.IMREAD_ANYDEPTH)
    if depth is None:
        raise IOError(f"failed to read depth {path}")
    if width is not None:
        depth = cv2.resize(depth, (width, height))
    return depth.astype(np.float32) / 1000.0


def read_pose(path: str) -> np.ndarray:
    """4x4 cam-to-world pose from whitespace text (data/scannet.py:127)."""
    pose = np.loadtxt(path).astype(np.float32)
    assert pose.shape == (4, 4), f"bad pose shape {pose.shape} in {path}"
    return pose


def pose_is_finite(pose: np.ndarray) -> bool:
    return bool(np.all(np.isfinite(pose)))


def scannet_intrinsics(width: int, height: int) -> np.ndarray:
    """Fixed ScanNet intrinsics scaled from 640x480 (data/scannet.py:83-87)."""
    sw, sh = width / 640.0, height / 480.0
    return np.array(
        [
            [577.87 * sw, 0.0, 319.5 * sw],
            [0.0, 577.87 * sh, 239.5 * sh],
            [0.0, 0.0, 1.0],
        ],
        dtype=np.float32,
    )


def read_split_file(path: str) -> List[str]:
    with open(path) as f:
        return [line.strip() for line in f if line.strip()]
