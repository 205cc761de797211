"""tools/export_pointcloud.py: fused PLY export from depth dumps
(driver for /root/reference/utils/utils.py:262-311)."""

import os
import subprocess
import sys

import numpy as np

TOOLS = os.path.join(os.path.dirname(__file__), "..", "tools")


def test_export_synthetic_cloud(tmp_path):
    from estdepth_tpu.data.synthetic import (
        SyntheticSceneConfig, synthetic_stream,
    )

    cfg = SyntheticSceneConfig(height=64, width=80, seed=0)
    frames = list(synthetic_stream(cfg, n_frames=4))
    for idx, f in enumerate(frames):
        np.save(tmp_path / f"synthetic0_{idx:06d}_depth.npy",
                f["dmap"].astype(np.float16))

    out = tmp_path / "cloud.ply"
    r = subprocess.run(
        [sys.executable, os.path.join(TOOLS, "export_pointcloud.py"),
         "--preddir", str(tmp_path), "--scene", "synthetic0",
         "--out", str(out), "--synthetic",
         "--height", "64", "--width", "80", "--stride", "2",
         "--min-depth", "0.01", "--max-depth", "50.0"],
        capture_output=True, text=True,
        env=dict(os.environ, ESTDEPTH_PLATFORM="cpu"),
    )
    assert r.returncode == 0, r.stderr

    with open(out) as fh:
        header = [next(fh) for _ in range(10)]
        assert header[0].strip() == "ply"
        n = int(next(
            line for line in header if line.startswith("element vertex")
        ).split()[-1])
        first = next(
            line for line in fh if not line.startswith(("property", "end_"))
        )
    assert n > 1000
    vals = first.split()
    assert len(vals) == 6  # xyz + rgb

    # geometric sanity: frame 0's camera pose transforms its depth into the
    # same world frame used by the export — points must lie inside the
    # frustum depth range seen by that camera
    pts = np.loadtxt(out, skiprows=10, max_rows=200)[:, :3]
    pose0 = np.asarray(frames[0]["cam_pose"], np.float64)
    cam = (np.linalg.inv(pose0)[:3, :3] @ pts.T
           + np.linalg.inv(pose0)[:3, 3:4]).T
    assert np.all(cam[:, 2] > 0)  # in front of the first camera
