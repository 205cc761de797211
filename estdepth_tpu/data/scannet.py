"""ScanNet training dataset: overlapping 5-frame windows.

Behavioral equivalent of ScannetDataset
(/root/reference/data/scannet.py:61-272):
  * scene layout <root>/<scene>/{rgb/%d.jpg, depth/%d.png, pose/%d.txt};
  * every 10th frame (interval, :258), non-finite pose truncates the scene
    (:216-223);
  * per-scene index cached next to the data (:206-248);
  * windows of n_frames starting at i-r for i in range(r, len-r, r//2) —
    the effective windows of build_dataset_index_train + read_sample_train
    (:250-272, :114);
  * resize to (width, height), BGR->RGB, depth mm->m, validity mask in
    [depth_min, depth_max], >=50% valid assertion (:142-149);
  * corrupt-sample retry with random substitution (:169-178).

Emits channels-last numpy samples ready for the TPU input pipeline.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import numpy as np

from estdepth_tpu.data import io_utils

_CACHE_NAME = "scene_index.json"


def _load_scan(
    scan_path: str, interval: int = 10, use_cache: bool = True,
    reload_scan: bool = False,
) -> Dict[str, List[str]]:
    cache = os.path.join(scan_path, _CACHE_NAME)
    if use_cache and os.path.exists(cache) and not reload_scan:
        with open(cache) as f:
            return json.load(f)

    pose_dir = os.path.join(scan_path, "pose")
    ids = sorted(
        int(os.path.basename(p).split(".")[0])
        for p in os.listdir(pose_dir)
        if p.endswith(".txt")
    )
    images, depths, poses = [], [], []
    for i in ids[::interval]:
        pose_file = os.path.join(scan_path, "pose", f"{i}.txt")
        pose = np.loadtxt(pose_file)
        if not np.all(np.isfinite(pose)):
            break  # reference truncates at the first bad pose (:220-221)
        poses.append(pose_file)
        images.append(os.path.join(scan_path, "rgb", f"{i}.jpg"))
        depths.append(os.path.join(scan_path, "depth", f"{i}.png"))

    info = {"images": images, "depths": depths, "poses": poses}
    if use_cache:
        try:
            with open(cache, "w") as f:
                json.dump(info, f)
        except OSError:
            pass
    return info


def photometric_augment(
    images: np.ndarray, rng: np.random.Generator
) -> np.ndarray:
    """Gamma / brightness / per-channel color jitter on a [V, H, W, 3]
    window in 0..255 (reference augument(), scannet.py:40-58)."""
    images = np.asarray(images, np.float64)
    gamma = rng.uniform(0.9, 1.1)
    images = 255.0 * (images / 255.0) ** gamma
    images *= rng.uniform(0.8, 1.2)
    images *= rng.uniform(0.8, 1.2, size=3).reshape(1, 1, 1, 3)
    return np.clip(images, 0.0, 255.0).astype(np.float32)


class ScanNetTrainDataset:
    def __init__(
        self,
        dataset_path: str,
        split_txt: Optional[str] = None,
        height: int = 256,
        width: int = 320,
        n_frames: int = 5,
        depth_min: float = 0.1,
        depth_max: float = 10.0,
        frame_interval: int = 10,
        min_valid_ratio: float = 0.5,
        reload_scan: bool = False,
        seed: int = 0,
        backend: str = "auto",
        augment_prob: float = 0.0,
    ):
        """backend: "native" (threaded C++ decode, data/native/), "cv2",
        or "auto" (native when it builds, else cv2).

        augment_prob: probability of applying the reference's photometric
        augmentation (gamma/brightness/color jitter, scannet.py:40-58) per
        window. The reference ships it DISABLED ("it seems that augment
        will influence accuracy", scannet.py:180-183) — default 0.0 keeps
        that behavior; pass 0.5 for the reference's commented-out recipe."""
        self.dataset_path = dataset_path
        self.height = height
        self.width = width
        self.n_frames = n_frames
        self.depth_min = depth_min
        self.depth_max = depth_max
        self.min_valid_ratio = min_valid_ratio
        self.augment_prob = augment_prob
        # NOTE: __getitem__ derives a per-(seed, index) Generator instead of
        # sharing one — TrainLoader maps items over a thread pool, and
        # numpy Generators are not thread-safe (shared state would produce
        # undefined/correlated draws and break seeded reproducibility)
        self.seed = seed

        if backend == "auto":
            from estdepth_tpu.data import native

            backend = "native" if native.available() else "cv2"
        self.backend = backend

        if split_txt and os.path.exists(split_txt):
            self.scenes = io_utils.read_split_file(split_txt)
        else:
            self.scenes = sorted(os.listdir(dataset_path))

        self.cam_intr = io_utils.scannet_intrinsics(width, height)
        self._build_index(frame_interval, reload_scan)

    def _build_index(self, interval: int, reload_scan: bool):
        self.index: List[Dict[str, List[str]]] = []
        r = self.n_frames
        skip = r // 2
        for scan in self.scenes:
            info = _load_scan(
                os.path.join(self.dataset_path, scan), interval,
                reload_scan=reload_scan,
            )
            images, depths, poses = info["images"], info["depths"], info["poses"]
            for i in range(r, len(images) - r, skip):
                s = i - r  # reference reads the first n_frames of [i-r:i+r+1]
                self.index.append(
                    {
                        "images": images[s : s + r],
                        "depths": depths[s : s + r],
                        "poses": poses[s : s + r],
                    }
                )

    def __len__(self) -> int:
        return len(self.index)

    def _read(self, i: int, rng: np.random.Generator) -> Dict[str, np.ndarray]:
        blob = self.index[i]
        if self.backend == "native":
            from estdepth_tpu.data import native

            imgs, depths, poses = native.read_window(
                blob["images"], blob["depths"], blob["poses"],
                self.width, self.height,
            )
        else:
            imgs = np.stack([
                io_utils.read_image_rgb(p, self.width, self.height)
                for p in blob["images"]
            ])
            depths = np.stack([
                io_utils.read_depth_mm(p, self.width, self.height)
                for p in blob["depths"]
            ])
            poses = np.stack([io_utils.read_pose(p) for p in blob["poses"]])

        assert np.all(np.isfinite(poses))
        masks = (
            (depths >= self.depth_min)
            & (depths <= self.depth_max)
            & np.isfinite(depths)
        )
        depths = np.where(masks, depths, 0.0)
        ratios = masks.reshape(self.n_frames, -1).mean(axis=1)
        assert ratios.min() > self.min_valid_ratio, (
            f"only {ratios.min():.0%} valid depth"
        )
        if self.augment_prob > 0 and rng.uniform() < self.augment_prob:
            imgs = photometric_augment(imgs, rng)
        return {
            "imgs": imgs.astype(np.float32),        # [V,H,W,3]
            "cam_poses": poses.astype(np.float32),  # [V,4,4]
            "cam_intr": self.cam_intr,              # [3,3]
            # targets are frames 1..V-2 (model consumes only those GTs)
            "dmaps": depths[1:-1].astype(np.float32),  # [T,H,W]
            "dmasks": masks[1:-1],                     # [T,H,W]
        }

    def set_epoch(self, epoch: int) -> None:
        """Fold the epoch into the per-item rng (called by TrainLoader) so
        the corrupt-sample substitution draws fresh each epoch, like the
        reference's unseeded random resample (scannet.py:169-178), while
        staying deterministic and thread-safe."""
        self._epoch = int(epoch)

    def __getitem__(self, i: int) -> Dict[str, np.ndarray]:
        # per-item generator: deterministic in (seed, epoch, index), safe
        # under the loader's thread pool
        rng = np.random.default_rng(
            (self.seed, getattr(self, "_epoch", 0), i)
        )
        # corrupt-sample retry with random substitution (scannet.py:169-178)
        for _ in range(32):
            try:
                return self._read(i, rng)
            except Exception:
                i = int(rng.integers(0, len(self)))
        raise RuntimeError("too many consecutive corrupt samples")
