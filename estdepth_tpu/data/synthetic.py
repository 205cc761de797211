"""Hermetic synthetic video-depth scenes with closed-form ground truth.

The reference has no hermetic test data (SURVEY.md §4); this module provides
it: a textured slanted plane rendered from a moving pinhole camera. Depth is
analytic, so train/eval/bench run without ScanNet and correctness is
checkable to the pixel.

All arrays are numpy host-side (this is the input pipeline boundary).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import numpy as np


@dataclasses.dataclass(frozen=True)
class SyntheticSceneConfig:
    height: int = 256
    width: int = 320
    # plane: n . X = offset, gently slanted
    plane_normal: tuple = (0.15, -0.1, 1.0)
    plane_offset: float = 2.5
    # camera path: translation step per frame + small yaw
    step_x: float = 0.08
    step_z: float = 0.02
    yaw_per_frame: float = 0.01
    focal: float = 288.935303  # ScanNet fx/2 at 320-wide (data/scannet.py:83-87)
    seed: int = 0


def _intrinsics(cfg: SyntheticSceneConfig) -> np.ndarray:
    return np.array(
        [
            [cfg.focal, 0.0, (cfg.width - 1) / 2.0],
            [0.0, cfg.focal, (cfg.height - 1) / 2.0],
            [0.0, 0.0, 1.0],
        ],
        dtype=np.float32,
    )


def _pose(cfg: SyntheticSceneConfig, frame: int) -> np.ndarray:
    yaw = cfg.yaw_per_frame * frame
    c, s = np.cos(yaw), np.sin(yaw)
    p = np.eye(4, dtype=np.float32)
    p[:3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], dtype=np.float32)
    p[0, 3] = cfg.step_x * frame
    p[2, 3] = cfg.step_z * frame
    return p


def _render(cfg: SyntheticSceneConfig, pose: np.ndarray):
    """Returns (rgb [H,W,3] in 0..255, depth [H,W] metric)."""
    k = _intrinsics(cfg)
    h, w = cfg.height, cfg.width
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    pix = np.stack(
        [xx.ravel(), yy.ravel(), np.ones(h * w)], axis=0
    ).astype(np.float64)
    rays = np.linalg.inv(k) @ pix  # unit-z camera rays
    n = np.asarray(cfg.plane_normal, dtype=np.float64)
    r, cpos = pose[:3, :3].astype(np.float64), pose[:3, 3].astype(np.float64)
    dirs = r @ rays
    denom = n @ dirs
    t = (cfg.plane_offset - n @ cpos) / denom  # depth (rays are unit-z)
    world = dirs * t + cpos[:, None]

    rng_phase = cfg.seed * 0.7
    u, v = world[0], world[1]
    rgb = np.stack(
        [
            0.5 + 0.5 * np.sin(3.1 * u + rng_phase) * np.cos(2.3 * v),
            0.5 + 0.5 * np.cos(1.7 * u - 1.1 * v + rng_phase),
            0.5 + 0.25 * np.sin(5.0 * u + 4.0 * v) + 0.25 * np.cos(0.9 * v),
        ],
        axis=-1,
    )
    rgb = (255.0 * np.clip(rgb, 0, 1)).astype(np.float32).reshape(h, w, 3)
    depth = np.where(denom > 1e-6, t, 0.0).astype(np.float32).reshape(h, w)
    return rgb, depth


def synthetic_window(
    cfg: Optional[SyntheticSceneConfig] = None,
    n_frames: int = 5,
    start_frame: int = 0,
    depth_min: float = 0.01,
    depth_max: float = 10.0,
    batch: int = 1,
) -> Dict[str, np.ndarray]:
    """A training/eval window in the model's input format.

    Returns imgs [B,V,H,W,3] (0..255), cam_poses [B,V,4,4] cam-to-world,
    cam_intr [B,3,3], dmaps [B,T,H,W], dmasks [B,T,H,W] bool, where T = V-2
    targets are frames 1..V-2 (model_hybrid.py:152-164).
    """
    cfg = cfg or SyntheticSceneConfig()
    imgs, poses, depths = [], [], []
    for f in range(start_frame, start_frame + n_frames):
        rgb, depth = _render(cfg, _pose(cfg, f))
        imgs.append(rgb)
        poses.append(_pose(cfg, f))
        depths.append(depth)
    imgs = np.stack(imgs)[None]
    poses = np.stack(poses)[None]
    depths = np.stack(depths)[None]
    dmaps = depths[:, 1 : n_frames - 1]
    dmasks = (dmaps > depth_min) & (dmaps < depth_max) & np.isfinite(dmaps)
    out = {
        "imgs": imgs.astype(np.float32),
        "cam_poses": poses.astype(np.float32),
        "cam_intr": _intrinsics(cfg)[None],
        "dmaps": dmaps.astype(np.float32),
        "dmasks": dmasks,
    }
    if batch > 1:
        out = {k: np.repeat(v, batch, axis=0) for k, v in out.items()}
    return out


def synthetic_stream(
    cfg: Optional[SyntheticSceneConfig] = None,
    n_frames: int = 20,
    depth_min: float = 0.01,
    depth_max: float = 10.0,
):
    """Per-frame stream for ESTM mode (general_eval_seq.py behavior)."""
    cfg = cfg or SyntheticSceneConfig()
    k = _intrinsics(cfg)
    for f in range(n_frames):
        pose = _pose(cfg, f)
        rgb, depth = _render(cfg, pose)
        mask = (depth > depth_min) & (depth < depth_max) & np.isfinite(depth)
        yield {
            "img": rgb,
            "cam_pose": pose,
            "cam_intr": k,
            "dmap": depth,
            "dmask": mask,
        }
