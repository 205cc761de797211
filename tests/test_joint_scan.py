"""Joint-mode lax.scan processor == the per-window JointRunner loop.

The joint window chain (5-frame windows advancing by 3, last target's K/V
threaded as a 1-entry memory — reference eval_hybrid.py:229-243) must be
bit-compatible between the dispatch-per-window loop driver and the
whole-scene scan program, for both pose pairings and with --no-est.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

# loop-vs-scan whole-scene equivalence
pytestmark = pytest.mark.slow

from estdepth_tpu.data.synthetic import SyntheticSceneConfig, synthetic_stream
from estdepth_tpu.eval.sequence import make_joint_processor
from estdepth_tpu.models import DepthNetHybrid

H, W, ND, LW = 64, 96, 8, 5


@pytest.fixture(scope="module")
def setup():
    model = DepthNetHybrid(
        ndepths=ND, depth_min=0.5, depth_max=8.0, resnet=18,
        est_transformer=True,
    )
    cfg = SyntheticSceneConfig(height=H, width=W, focal=80.0)
    frames = list(synthetic_stream(cfg, n_frames=12, depth_min=0.5,
                                   depth_max=8.0))
    imgs = np.stack([f["img"] for f in frames]).astype(np.float32)
    poses = np.stack([f["cam_pose"] for f in frames]).astype(np.float32)
    intr = frames[0]["cam_intr"].astype(np.float32)
    variables = jax.jit(
        lambda r, i, p, k: model.init(r, i, p, k, train=False)
    )(jax.random.key(0), jnp.asarray(imgs[None, :LW]),
      jnp.asarray(poses[None, :LW]), jnp.asarray(intr[None]))
    return model, variables, imgs, poses, intr


def _loop_depths(model, variables, imgs, poses, intr, n_windows,
                 est_on=True, reference_pose_pairing=False):
    from tools.eval_joint import JointRunner

    runner = JointRunner(model, variables, est_on=est_on,
                         reference_pose_pairing=reference_pose_pairing)
    stride = LW - 2
    out = []
    for wi in range(n_windows):
        s = wi * stride
        depth, _ = runner.run_window(
            jnp.asarray(imgs[None, s : s + LW]),
            jnp.asarray(poses[None, s : s + LW]),
            jnp.asarray(intr[None]),
        )
        out.append(np.asarray(depth[0]))  # [Tt, 4, H, W]
    return np.stack(out)  # [NW, Tt, 4, H, W]


def test_joint_scan_matches_loop_and_drops_padded_tail(setup):
    model, variables, imgs, poses, intr = setup
    # 11 frames -> windows at starts 0/3/6 (frame 11 beyond the grid)
    n_windows = 3
    t_used = (n_windows - 1) * (LW - 2) + LW  # 11

    process = make_joint_processor(model, seq_length=LW)
    scan = process(variables, jnp.asarray(imgs[None, :t_used]),
                   jnp.asarray(poses[None, :t_used]),
                   jnp.asarray(intr[None]))
    assert scan.shape == (1, n_windows, LW - 2, 4, H, W)

    loop = _loop_depths(model, variables, imgs, poses, intr, n_windows)
    np.testing.assert_allclose(np.asarray(scan[0]), loop,
                               rtol=1e-3, atol=2e-3)

    # tail padding: pad the 12-frame scene to the next window grid (T=14,
    # NW=4) by repeating the last frame; the real windows' outputs must be
    # unchanged (the padded window only ever corrupts entries consumed by
    # later padded windows)
    pad = np.concatenate([imgs, np.repeat(imgs[-1:], 2, 0)])
    pad_p = np.concatenate([poses, np.repeat(poses[-1:], 2, 0)])
    padded = process(variables, jnp.asarray(pad[None]),
                     jnp.asarray(pad_p[None]), jnp.asarray(intr[None]))
    assert padded.shape == (1, n_windows + 1, LW - 2, 4, H, W)
    np.testing.assert_allclose(np.asarray(padded[0, :n_windows]), loop,
                               rtol=1e-3, atol=2e-3)


def test_joint_scan_strict_pose_pairing(setup):
    model, variables, imgs, poses, intr = setup
    process = make_joint_processor(model, seq_length=LW,
                                   reference_pose_pairing=True)
    scan = process(variables, jnp.asarray(imgs[None, :11]),
                   jnp.asarray(poses[None, :11]), jnp.asarray(intr[None]))
    loop = _loop_depths(model, variables, imgs, poses, intr, 3,
                        reference_pose_pairing=True)
    np.testing.assert_allclose(np.asarray(scan[0]), loop,
                               rtol=1e-3, atol=2e-3)
    # the two pairings genuinely differ (the poses move in this scene), so
    # the strict test isn't vacuous
    geo = make_joint_processor(model, seq_length=LW)(
        variables, jnp.asarray(imgs[None, :11]),
        jnp.asarray(poses[None, :11]), jnp.asarray(intr[None]))
    assert np.abs(np.asarray(scan) - np.asarray(geo)).max() > 1e-4


def test_joint_scan_no_est(setup):
    model, variables, imgs, poses, intr = setup
    process = make_joint_processor(model, seq_length=LW, est_on=False,
                                   output_scales=(0, 2))
    scan = process(variables, jnp.asarray(imgs[None, :11]),
                   jnp.asarray(poses[None, :11]), jnp.asarray(intr[None]))
    assert scan.shape == (1, 3, LW - 2, 2, H, W)
    loop = _loop_depths(model, variables, imgs, poses, intr, 3,
                        est_on=False)
    np.testing.assert_allclose(np.asarray(scan[0]), loop[:, :, (0, 2)],
                               rtol=1e-3, atol=2e-3)
