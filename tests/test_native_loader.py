"""Native C++ loader vs the cv2 reference path."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from estdepth_tpu.data import native
from estdepth_tpu.data import io_utils

pytestmark = pytest.mark.skipif(
    not native.available(),
    reason=f"native loader unavailable: {native.build_error()}",
)


@pytest.fixture(scope="module")
def files(tmp_path_factory):
    d = tmp_path_factory.mktemp("native")
    rng = np.random.default_rng(0)
    # smooth image so codec/resize differences stay tiny
    yy, xx = np.meshgrid(np.arange(48), np.arange(64), indexing="ij")
    img = np.stack(
        [
            127 + 100 * np.sin(xx / 9.0),
            127 + 100 * np.cos(yy / 7.0),
            127 + 80 * np.sin((xx + yy) / 11.0),
        ],
        -1,
    ).astype(np.uint8)
    jpg = str(d / "img.jpg")
    cv2.imwrite(jpg, cv2.cvtColor(img, cv2.COLOR_RGB2BGR),
                [cv2.IMWRITE_JPEG_QUALITY, 98])
    depth_mm = rng.integers(500, 4500, (48, 64)).astype(np.uint16)
    png = str(d / "depth.png")
    cv2.imwrite(png, depth_mm)
    pose = np.eye(4)
    pose[:3, 3] = [0.1, -0.2, 0.3]
    pose_txt = str(d / "pose.txt")
    np.savetxt(pose_txt, pose)
    return jpg, png, pose_txt


def test_jpeg_matches_cv2(files):
    jpg, _, _ = files
    got = native.read_image_rgb(jpg, 40, 32)
    want = io_utils.read_image_rgb(jpg, 40, 32)
    # same decoder family + same half-pixel bilinear; differences come from
    # cv2's fixed-point resize arithmetic
    assert np.abs(got - want).mean() < 1.0
    assert np.abs(got - want).max() < 16.0


def test_png16_matches_cv2(files):
    _, png, _ = files
    got = native.read_depth_m(png, 40, 32)
    want = io_utils.read_depth_mm(png, 40, 32)
    assert np.abs(got - want).max() < 0.02  # meters


def test_pose_matches(files):
    _, _, pose_txt = files
    got = native.read_pose(pose_txt)
    want = io_utils.read_pose(pose_txt)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_threaded_window(files):
    jpg, png, pose_txt = files
    imgs, depths, poses = native.read_window(
        [jpg] * 5, [png] * 5, [pose_txt] * 5, 40, 32
    )
    assert imgs.shape == (5, 32, 40, 3)
    assert depths.shape == (5, 32, 40)
    assert poses.shape == (5, 4, 4)
    np.testing.assert_array_equal(imgs[0], imgs[4])
    np.testing.assert_allclose(poses[2], np.loadtxt(pose_txt), rtol=1e-6)


def test_scannet_dataset_native_backend(tmp_path, files):
    jpg, png, pose_txt = files
    scene = tmp_path / "scene0000_00"
    for sub in ("rgb", "depth", "pose"):
        os.makedirs(scene / sub)
    import shutil

    for i in range(0, 140, 2):
        shutil.copy(jpg, scene / "rgb" / f"{i}.jpg")
        shutil.copy(png, scene / "depth" / f"{i}.png")
        shutil.copy(pose_txt, scene / "pose" / f"{i}.txt")

    from estdepth_tpu.data.scannet import ScanNetTrainDataset

    ds_native = ScanNetTrainDataset(
        str(tmp_path), height=32, width=40, n_frames=5, frame_interval=2,
        backend="native",
    )
    ds_cv2 = ScanNetTrainDataset(
        str(tmp_path), height=32, width=40, n_frames=5, frame_interval=2,
        backend="cv2",
    )
    a, b = ds_native[0], ds_cv2[0]
    assert np.abs(a["imgs"] - b["imgs"]).mean() < 1.0
    assert np.abs(a["dmaps"] - b["dmaps"]).max() < 0.02
    np.testing.assert_allclose(a["cam_poses"], b["cam_poses"], rtol=1e-6)
    assert (a["dmasks"] == b["dmasks"]).mean() > 0.99
