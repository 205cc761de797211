"""Dataset-protocol parity vs the ACTUAL reference dataset code.

The model-side parity harness (test_reference_parity.py) executes the
reference's networks; this file executes the reference's data/ package —
`data.scannet.ScannetDataset` and `data.general_eval_seq.SevenScenesSeq`
from /root/reference, with torchvision/natsort stubbed
(utils/reference_runner.py) — on the same fake on-disk scene as our
readers, and asserts identical frame selection, window structure, and
sample tensors (images, depths, masks, poses, intrinsics)."""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
cv2 = pytest.importorskip("cv2")

# executes the actual reference dataset code
pytestmark = pytest.mark.slow

from estdepth_tpu.data.eval_stream import StreamEvalDataset
from estdepth_tpu.data.scannet import ScanNetTrainDataset
from estdepth_tpu.utils.reference_runner import import_reference_datasets

H, W = 64, 96


@pytest.fixture(scope="module")
def ref_data():
    return import_reference_datasets()


@pytest.fixture(scope="module")
def fake_scene(tmp_path_factory):
    """One ScanNet-layout scene; ~26 indexed frames after every-10th
    subsampling so several 5-frame windows exist."""
    root = tmp_path_factory.mktemp("scannet_refparity")
    rng = np.random.default_rng(7)
    sp = root / "scene0042_00"
    for sub in ("rgb", "depth", "pose"):
        os.makedirs(sp / sub)
    for i in range(0, 520, 2):  # irregular raw ids: every 2nd
        img = rng.integers(0, 255, size=(48, 64, 3), dtype=np.uint8)
        cv2.imwrite(str(sp / "rgb" / f"{i}.jpg"), img)
        depth_mm = rng.integers(900, 4500, size=(48, 64)).astype(np.uint16)
        cv2.imwrite(str(sp / "depth" / f"{i}.png"), depth_mm)
        pose = np.eye(4)
        pose[0, 3] = 0.01 * i
        pose[1, 3] = 0.003 * i
        np.savetxt(str(sp / "pose" / f"{i}.txt"), pose)
    return str(root)


def test_scannet_train_dataset_matches_reference(ref_data, fake_scene):
    ref_ds = ref_data.scannet.ScannetDataset(
        fake_scene, split_txt=os.path.join(fake_scene, "missing.txt"),
        height=H, width=W, n_frames=5, depth_min=0.1, depth_max=10.0,
        reloadscan=True,
    )
    ours = ScanNetTrainDataset(
        fake_scene, height=H, width=W, n_frames=5,
        depth_min=0.1, depth_max=10.0, backend="cv2", reload_scan=True,
    )

    # identical window structure: count and per-window file lists
    assert len(ref_ds) == len(ours) > 2
    for k in range(len(ours)):
        ref_imgs = ref_ds.dataset_index[k]["images"][:5]
        assert [os.path.basename(p) for p in ref_imgs] == [
            os.path.basename(p) for p in ours.index[k]["images"]
        ], f"window {k}"

    # identical sample tensors
    k = 1
    ref_s = ref_ds[k]
    our_s = ours[k]
    np.testing.assert_allclose(
        our_s["imgs"],  # [V,H,W,3]
        ref_s["imgs"].permute(0, 2, 3, 1).numpy(),
        atol=1e-4, err_msg="images (resize+BGR2RGB)",
    )
    # ours trims GT to the target frames [1:-1]
    np.testing.assert_allclose(
        our_s["dmaps"],
        ref_s["dmaps"][1:-1, 0].numpy(), atol=1e-6, err_msg="depths",
    )
    np.testing.assert_array_equal(
        our_s["dmasks"], ref_s["dmasks"][1:-1, 0].numpy(), err_msg="masks"
    )
    np.testing.assert_allclose(
        our_s["cam_poses"], ref_s["cam_poses"].numpy(), atol=1e-6,
        err_msg="poses",
    )
    np.testing.assert_allclose(
        our_s["cam_intr"], ref_s["cam_intr"].numpy(), atol=1e-4,
        err_msg="intrinsics (577.87 scaled)",
    )


def test_stream_eval_dataset_matches_reference(ref_data, fake_scene):
    ref_ds = ref_data.general_eval_seq.SevenScenesSeq(
        fake_scene, image_size=[W, H], depth_min=0.01, depth_max=5.0,
        frame_interval=10, eval_dataset="scannet",
    )
    ref_ds.reset("scene0042_00")
    ours = StreamEvalDataset(
        fake_scene, height=H, width=W, depth_min=0.01, depth_max=5.0,
        frame_interval=10, scannet_layout=True,
    )
    ours.reset("scene0042_00")

    assert len(ref_ds) == len(ours) > 3
    our_frames = list(iter(ours))
    for k in (0, 1, len(ours) - 1):
        ref_s = ref_ds[k]
        our_f = our_frames[k]
        assert os.path.basename(ref_s["img_path"]) == os.path.basename(
            our_f["img_path"]
        ), f"frame selection at {k}"
        np.testing.assert_allclose(
            our_f["img"],  # [H,W,3] float 0..255
            ref_s["img"][0].permute(1, 2, 0).numpy(),
            atol=1e-4, err_msg="image",
        )
        # GT depth stays at native resolution, masked-invalid set to 0
        np.testing.assert_allclose(
            our_f["dmap"], ref_s["dmap"][0, 0].numpy(), atol=1e-6,
            err_msg="depth",
        )
        np.testing.assert_array_equal(
            our_f["dmask"], ref_s["dmask"][0, 0].numpy().astype(bool),
            err_msg="mask",
        )
        np.testing.assert_allclose(
            our_f["cam_pose"], ref_s["cam_pose"][0].numpy(), atol=1e-6,
            err_msg="pose",
        )
        np.testing.assert_allclose(
            our_f["cam_intr"], ref_s["cam_intr"][0].numpy(), atol=1e-4,
            err_msg="intrinsics",
        )


@pytest.fixture(scope="module")
def fake_7scenes(tmp_path_factory):
    """One 7-Scenes-layout sequence: frame-%06d.{color.png,depth.png,pose.txt}."""
    root = tmp_path_factory.mktemp("sevenscenes_refparity")
    rng = np.random.default_rng(11)
    sp = root / "chess" / "seq-03"
    os.makedirs(sp)
    for i in range(120):
        img = rng.integers(0, 255, size=(48, 64, 3), dtype=np.uint8)
        cv2.imwrite(str(sp / f"frame-{i:06d}.color.png"), img)
        depth_mm = rng.integers(400, 4800, size=(48, 64)).astype(np.uint16)
        cv2.imwrite(str(sp / f"frame-{i:06d}.depth.png"), depth_mm)
        pose = np.eye(4)
        pose[0, 3] = 0.02 * i
        np.savetxt(str(sp / f"frame-{i:06d}.pose.txt"), pose)
    return str(root)


def test_window_eval_dataset_matches_reference(ref_data, fake_7scenes):
    from estdepth_tpu.data.eval_windows import WindowEvalDataset

    ref_ds = ref_data.general_eval.SevenScenes(
        fake_7scenes, image_size=[W, H], depth_min=0.3, depth_max=5.0,
        seq_length=5, frame_interval=10, seq_inter=3,
    )
    ref_ds.reset("chess", "seq-03")
    ours = WindowEvalDataset(
        fake_7scenes, height=H, width=W, depth_min=0.3, depth_max=5.0,
        seq_length=5, frame_interval=10, scannet_layout=False,
    )  # default seq_inter = (5-2)*10 == reference seq_inter 3 * interval 10
    ours.reset("chess", "seq-03")

    assert len(ref_ds) == len(ours) > 1
    for k in range(len(ours)):
        ref_s = ref_ds[k]
        our_s = ours[k]
        assert [os.path.basename(p) for p in ref_s["img_path"]] == [
            os.path.basename(p) for p in our_s["img_paths"]
        ], f"window {k} frame selection"

    ref_s, our_s = ref_ds[1], ours[1]
    np.testing.assert_allclose(
        our_s["imgs"][0],
        ref_s["imgs"][0].permute(0, 2, 3, 1).numpy(), atol=1e-4,
        err_msg="images",
    )
    np.testing.assert_allclose(
        our_s["dmaps"][0], ref_s["dmaps"][0, 1:-1, 0].numpy(), atol=1e-6,
        err_msg="depths (native res, targets only)",
    )
    np.testing.assert_array_equal(
        our_s["dmasks"][0], ref_s["dmasks"][0, 1:-1, 0].numpy().astype(bool),
        err_msg="masks",
    )
    np.testing.assert_allclose(
        our_s["cam_poses"][0], ref_s["cam_poses"][0].numpy(), atol=1e-6,
        err_msg="poses",
    )
    np.testing.assert_allclose(
        our_s["cam_intr"][0], ref_s["cam_intr"][0].numpy(), atol=1e-4,
        err_msg="intrinsics",
    )


def test_keyframe_dataset_matches_reference(ref_data, fake_scene, tmp_path):
    """scannet_select.ScannetTestDataset (keyframe ±10/20/30/40 selection
    incl. the index<10 flip) vs data/keyframe_eval.py. Two documented
    reference quirks NOT replicated: its __len__ references a nonexistent
    attribute (crashes — we use the list length), and it returns UNSCALED
    640x480 intrinsics regardless of the resize (we scale; the dataset is
    unused by any reference entry script, scannet_select.py:51)."""
    from estdepth_tpu.data.keyframe_eval import KeyframeEvalDataset

    listfile = tmp_path / "keyframes.txt"
    listfile.write_text("scene0042_00 6\nscene0042_00 104\n")

    ref_ds = ref_data.scannet_select.ScannetTestDataset(
        fake_scene, str(listfile), height=H, width=W,
        depth_min=0.1, depth_max=10.0,
    )
    ours = KeyframeEvalDataset(
        fake_scene, str(listfile), height=H, width=W,
        depth_min=0.1, depth_max=10.0,
    )

    assert len(ours) == 2  # reference __len__ is broken; ours works
    for k in range(2):
        ref_s = ref_ds[k]
        our_s = ours[k]
        assert [os.path.basename(p) for p in ref_s["img_path"]] == [
            os.path.basename(p) for p in our_s["img_paths"]
        ], f"keyframe window {k} (incl. index<10 flip)"
        np.testing.assert_allclose(
            our_s["imgs"][0],
            ref_s["imgs"][0].permute(0, 2, 3, 1).numpy(), atol=1e-4,
            err_msg="images",
        )
        np.testing.assert_allclose(
            our_s["dmaps"][0], ref_s["dmaps"][0, 1:-1, 0].numpy(),
            atol=1e-6, err_msg="depths",
        )
        np.testing.assert_allclose(
            our_s["cam_poses"][0], ref_s["cam_poses"][0].numpy(),
            atol=1e-6, err_msg="poses",
        )


def test_eval_all_and_start_index_match_reference(
    ref_data, fake_7scenes, fake_scene
):
    """The reference's window-densification (--eval_all: every start
    offset, general_eval.py:46-50) and streaming start_i offset
    (general_eval_seq.py:48-49) vs our eval_all / start_index options."""
    from estdepth_tpu.data.eval_windows import WindowEvalDataset

    ref_ds = ref_data.general_eval.SevenScenes(
        fake_7scenes, image_size=[W, H], seq_length=5,
        frame_interval=10, seq_inter=3, eval_all=True,
    )
    ref_ds.reset("chess", "seq-03")
    ours = WindowEvalDataset(
        fake_7scenes, height=H, width=W, seq_length=5,
        frame_interval=10, scannet_layout=False, eval_all=True,
    )
    ours.reset("chess", "seq-03")
    assert len(ref_ds) == len(ours) > 10
    for k in range(0, len(ours), 7):
        assert [os.path.basename(p) for p in ref_ds[k]["img_path"]] == [
            os.path.basename(p) for p in ours[k]["img_paths"]
        ], f"eval_all window {k}"

    ref_seq = ref_data.general_eval_seq.SevenScenesSeq(
        fake_scene, image_size=[W, H], frame_interval=10,
        start_i=3, eval_dataset="scannet",
    )
    ref_seq.reset("scene0042_00")
    ours_seq = StreamEvalDataset(
        fake_scene, height=H, width=W, frame_interval=10,
        scannet_layout=True, start_index=3,
    )
    ours_seq.reset("scene0042_00")
    assert len(ref_seq) == len(ours_seq) > 3
    our_frames = list(iter(ours_seq))
    for k in (0, len(ours_seq) - 1):
        assert os.path.basename(ref_seq[k]["img_path"]) == os.path.basename(
            our_frames[k]["img_path"]
        ), f"start_i frame {k}"
