"""Dataset readers on a generated on-disk fake ScanNet scene."""

import os

import numpy as np
import pytest

from estdepth_tpu.data.eval_stream import StreamEvalDataset
from estdepth_tpu.data.eval_windows import WindowEvalDataset
from estdepth_tpu.data.pipeline import TrainLoader
from estdepth_tpu.data.scannet import ScanNetTrainDataset
from estdepth_tpu.data.synthetic import SyntheticSceneConfig, synthetic_window

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def fake_scannet(tmp_path_factory):
    """Two tiny scenes in ScanNet layout: rgb/%d.jpg depth/%d.png pose/%d.txt."""
    root = tmp_path_factory.mktemp("scannet")
    rng = np.random.default_rng(0)
    n_raw = 140  # every 10th frame -> 14 indexed frames per scene
    for scene in ("scene0000_00", "scene0001_00"):
        sp = root / scene
        for sub in ("rgb", "depth", "pose"):
            os.makedirs(sp / sub)
        for i in range(0, n_raw, 2):  # raw streams are irregularly spaced
            img = rng.integers(0, 255, size=(48, 64, 3), dtype=np.uint8)
            cv2.imwrite(str(sp / "rgb" / f"{i}.jpg"), img)
            depth_mm = rng.integers(800, 4000, size=(48, 64)).astype(np.uint16)
            cv2.imwrite(str(sp / "depth" / f"{i}.png"), depth_mm)
            pose = np.eye(4)
            pose[0, 3] = 0.01 * i
            np.savetxt(str(sp / "pose" / f"{i}.txt"), pose)
    return str(root)


def test_scannet_train_dataset(fake_scannet):
    ds = ScanNetTrainDataset(
        fake_scannet, height=32, width=40, n_frames=5, depth_min=0.1,
        depth_max=10.0, frame_interval=2,
    )
    assert len(ds) > 0
    s = ds[0]
    assert s["imgs"].shape == (5, 32, 40, 3)
    assert s["cam_poses"].shape == (5, 4, 4)
    assert s["dmaps"].shape == (3, 32, 40)
    assert s["dmasks"].dtype == bool
    assert s["dmaps"].min() >= 0
    # scene index cache created
    assert os.path.exists(
        os.path.join(fake_scannet, "scene0000_00", "scene_index.json")
    )


def test_train_loader_batches(fake_scannet):
    ds = ScanNetTrainDataset(
        fake_scannet, height=32, width=40, n_frames=5, frame_interval=2
    )
    loader = TrainLoader(ds, batch_size=2, num_workers=2)
    batches = list(loader.epoch(0))
    assert len(batches) == loader.steps_per_epoch()
    b = batches[0]
    assert b["imgs"].shape == (2, 5, 32, 40, 3)

    # sharding splits the sample space disjointly
    l0 = TrainLoader(ds, batch_size=1, shard_index=0, num_shards=2)
    l1 = TrainLoader(ds, batch_size=1, shard_index=1, num_shards=2)
    n0, n1 = len(list(l0.epoch(0))), len(list(l1.epoch(0)))
    assert n0 + n1 <= len(ds)
    assert abs(n0 - n1) <= 1


def test_window_eval_dataset_scannet_layout(fake_scannet):
    ds = WindowEvalDataset(
        fake_scannet, height=32, width=40, seq_length=5, frame_interval=2,
        scannet_layout=True,
    )
    ds.reset("scene0000_00")
    assert len(ds) > 0
    s = ds[0]
    assert s["imgs"].shape == (1, 5, 32, 40, 3)
    assert s["dmaps"].shape[0:2] == (1, 3)
    # GT depth kept at native resolution (general_eval.py:206-207)
    assert s["dmaps"].shape[2:] == (48, 64)


def test_window_sequence_matches_windows(fake_scannet):
    """sequence() (scan-mode reader) == the per-window __getitem__ view:
    every window is a seq_length-slice of the sampled sequence, and
    read_gt reproduces the window's GT maps/masks."""
    ds = WindowEvalDataset(
        fake_scannet, height=32, width=40, seq_length=5, frame_interval=2,
        scannet_layout=True,
    )
    ds.reset("scene0000_00")
    seq = ds.sequence()
    assert seq is not None
    stride, nw = seq["window_stride"], seq["n_windows"]
    assert nw == len(ds) and stride == 3
    assert seq["imgs"].shape[0] == (nw - 1) * stride + 5
    for wi in (0, 1, nw - 1):
        s = ds[wi]
        np.testing.assert_array_equal(
            seq["imgs"][wi * stride : wi * stride + 5], s["imgs"][0]
        )
        np.testing.assert_allclose(
            seq["cam_poses"][wi * stride : wi * stride + 5],
            s["cam_poses"][0],
        )
        for ti in range(3):
            gt, mask = ds.read_gt(seq["dmap_paths"][wi * stride + 1 + ti])
            np.testing.assert_allclose(gt, s["dmaps"][0, ti])
            np.testing.assert_array_equal(mask, s["dmasks"][0, ti])
    trunc = ds.sequence(max_windows=2)
    assert trunc["n_windows"] == 2
    assert trunc["imgs"].shape[0] == stride + 5

    # a pose-skipped window leaves a gap the scan cannot express ->
    # sequence() refuses and the driver falls back to the window loop
    poisoned = os.path.join(fake_scannet, "scene0001_00", "pose", "12.txt")
    original = open(poisoned).read()
    try:
        bad = np.eye(4)
        bad[0, 0] = np.inf
        np.savetxt(poisoned, bad)
        ds.reset("scene0001_00")
        assert ds.sequence() is None
    finally:
        with open(poisoned, "w") as f:
            f.write(original)


def test_stream_eval_dataset(fake_scannet):
    ds = StreamEvalDataset(
        fake_scannet, height=32, width=40, frame_interval=2, scannet_layout=True
    )
    ds.reset("scene0001_00")
    frames = list(ds)
    assert len(frames) == len(ds) and len(frames) > 3
    f = frames[0]
    assert f["img"].shape == (32, 40, 3)
    assert f["dmap"].shape == (48, 64)


def test_synthetic_window_geometry_consistency():
    """The synthetic GT must satisfy the multi-view constraint: projecting
    frame A's depth into frame B lands on pixels with matching texture."""
    cfg = SyntheticSceneConfig(height=64, width=96, focal=80.0)
    w = synthetic_window(cfg, n_frames=3)
    assert w["imgs"].shape == (1, 3, 64, 96, 3)
    assert w["dmaps"].shape == (1, 1, 64, 96)
    assert w["dmasks"].mean() > 0.9
    # depth is within the plausible plane distance range
    d = w["dmaps"][w["dmasks"]]
    assert 0.5 < d.min() and d.max() < 10.0


def test_train_loader_propagates_worker_exceptions():
    """A dataset error inside the producer thread must raise in the
    consumer, not hang the epoch (data/pipeline.py produce())."""
    import pytest

    from estdepth_tpu.data.pipeline import TrainLoader

    class Broken:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            raise RuntimeError("corrupt shard")

    loader = TrainLoader(Broken(), batch_size=2, num_workers=1)
    with pytest.raises(RuntimeError, match="corrupt shard"):
        next(iter(loader.epoch(0)))


def test_photometric_augment_bounds(rng):
    """Reference augument() port (scannet.py:40-58): range-preserving,
    shape-preserving, per-channel jitter actually varies channels."""
    from estdepth_tpu.data.scannet import photometric_augment

    imgs = rng.uniform(0, 255, size=(3, 16, 20, 3)).astype(np.float32)
    out = photometric_augment(imgs, np.random.default_rng(0))
    assert out.shape == imgs.shape and out.dtype == np.float32
    assert out.min() >= 0.0 and out.max() <= 255.0
    ratio = (out + 1) / (imgs + 1)
    assert not np.allclose(ratio[..., 0], ratio[..., 1])
