"""Depth / probability colorization for logging and dumps.

Behavioral equivalent of /root/reference/utils/misc_utils.py:6-59
(cv2 COLORMAP_RAINBOW over a normalized map). Host-side numpy.
"""

from __future__ import annotations

import numpy as np

try:
    import cv2

    HAVE_CV2 = True
except Exception:  # pragma: no cover
    cv2 = None
    HAVE_CV2 = False


def _rainbow(norm: np.ndarray) -> np.ndarray:
    u8 = (255.0 * np.clip(norm, 0.0, 1.0)).astype(np.uint8)
    if HAVE_CV2:
        bgr = cv2.applyColorMap(u8, cv2.COLORMAP_RAINBOW)
        return cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
    # numpy fallback: simple HSV-ish ramp
    h = u8.astype(np.float32) / 255.0
    r = np.clip(1.5 - np.abs(4 * h - 3), 0, 1)
    g = np.clip(1.5 - np.abs(4 * h - 2), 0, 1)
    b = np.clip(1.5 - np.abs(4 * h - 1), 0, 1)
    return (255 * np.stack([r, g, b], -1)).astype(np.uint8)


def colorize_depth(
    depth: np.ndarray, depth_min: float = None, depth_max: float = None
) -> np.ndarray:
    """[H, W] metric depth -> RGB uint8 (misc_utils.py:6-38)."""
    depth = np.asarray(depth, dtype=np.float32)
    dmin = float(np.nanmin(depth)) if depth_min is None else depth_min
    dmax = float(np.nanmax(depth)) if depth_max is None else depth_max
    norm = (depth - dmin) / max(dmax - dmin, 1e-6)
    return _rainbow(norm)


def colorize_probmap(prob: np.ndarray) -> np.ndarray:
    """[H, W] probability in [0,1] -> RGB uint8 (misc_utils.py:41-59)."""
    return _rainbow(np.asarray(prob, dtype=np.float32))


def save_image(path: str, rgb: np.ndarray):
    if HAVE_CV2:
        cv2.imwrite(path, cv2.cvtColor(rgb, cv2.COLOR_RGB2BGR))
    else:  # pragma: no cover
        from PIL import Image

        Image.fromarray(rgb).save(path)
