"""Joint-protocol StableHLO serving artifacts (estdepth_tpu/serving.py).

The exported first/steady window programs must reproduce a live
JointRunner window-for-window — the deployment form of the reference's
joint eval chain (/root/reference/eval_hybrid.py:229-243).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

# jax.export round-trip + oracle verify (joint)
pytestmark = pytest.mark.slow

from estdepth_tpu.data.synthetic import SyntheticSceneConfig, synthetic_stream
from estdepth_tpu.models import DepthNetHybrid
from estdepth_tpu.serving import export_joint, load_joint, load_stream

H, W, ND, LW = 64, 96, 8, 5


@pytest.fixture(scope="module")
def setup():
    model = DepthNetHybrid(
        ndepths=ND, depth_min=0.5, depth_max=8.0, resnet=18,
        est_transformer=True,
    )
    cfg = SyntheticSceneConfig(height=H, width=W, focal=80.0)
    frames = list(synthetic_stream(cfg, n_frames=11, depth_min=0.5,
                                   depth_max=8.0))
    variables = jax.jit(
        lambda r, i, p, k: model.init(r, i, p, k, train=False)
    )(jax.random.key(0),
      jnp.asarray(np.stack([f["img"] for f in frames[:LW]])[None]),
      jnp.asarray(np.stack([f["cam_pose"] for f in frames[:LW]])[None]),
      jnp.asarray(frames[0]["cam_intr"][None]))
    return model, variables, frames


def test_exported_joint_matches_live_runner(setup, tmp_path):
    from tools.eval_joint import JointRunner

    model, variables, frames = setup
    art = export_joint(
        model, variables, height=H, width=W, seq_length=LW,
        output_scales=(0, 2),
    )
    outdir = tmp_path / "joint"
    art.save(str(outdir))
    assert art.manifest["protocol"] == "joint"
    assert art.manifest["memory_size"] == 1

    exported = load_joint(str(outdir))
    live = JointRunner(model, variables, est_on=True)

    stride = LW - 2
    live_out = []
    for wi in range(3):
        s = wi * stride
        d, _ = live.run_window(
            jnp.asarray(np.stack(
                [f["img"] for f in frames[s : s + LW]])[None]),
            jnp.asarray(np.stack(
                [f["cam_pose"] for f in frames[s : s + LW]])[None]),
            jnp.asarray(frames[0]["cam_intr"][None]),
        )
        live_out.append(np.asarray(d[0])[:, (0, 2)])  # [Tt, 2, H, W]

    exp_out = []
    for f in frames:
        d = exported.push_frame(f["img"], f["cam_pose"], f["cam_intr"])
        if d is not None:
            exp_out.append(np.asarray(d[0]))
    assert len(exp_out) == 3
    np.testing.assert_allclose(np.stack(exp_out), np.stack(live_out),
                               rtol=1e-4, atol=1e-4)

    # per-scene reset: re-feeding the first window reproduces window 0
    exported.reset()
    redo = None
    for f in frames[:LW]:
        redo = exported.push_frame(f["img"], f["cam_pose"], f["cam_intr"])
    np.testing.assert_allclose(np.asarray(redo[0]), exp_out[0],
                               rtol=1e-5, atol=1e-5)

    # protocol guard: a joint artifact must not load as a stream one
    with pytest.raises(ValueError, match="load_joint"):
        load_stream(str(outdir))
