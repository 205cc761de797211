"""Golden regression: fixed seed + fixed input -> recorded depth output.

Catches unintended numerical drift in ANY part of the forward path
(encoders, warps, attention, decoder) across refactors. Regenerate
deliberately with: python tests/test_golden.py regen
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "forward_tiny.npz")


def _forward():
    from estdepth_tpu.data.synthetic import SyntheticSceneConfig, synthetic_window
    from estdepth_tpu.models import DepthNetHybrid

    model = DepthNetHybrid(
        ndepths=8, depth_min=0.5, depth_max=8.0, resnet=18, est_transformer=True
    )
    cfg = SyntheticSceneConfig(height=64, width=96, focal=80.0)
    w = synthetic_window(cfg, n_frames=5, depth_min=0.5, depth_max=8.0)
    imgs = jnp.asarray(w["imgs"])
    poses = jnp.asarray(w["cam_poses"])
    intr = jnp.asarray(w["cam_intr"])
    variables = jax.jit(
        lambda r, i, p, k: model.init(r, i, p, k, train=False)
    )(jax.random.key(42), imgs, poses, intr)
    # EST path (train-mode flag logic) in eval BN mode — exercises everything
    outputs = jax.jit(
        lambda v, i, p, k: model.apply(v, i, p, k, use_est=True, train=False)[0]
    )(variables, imgs, poses, intr)
    return np.asarray(outputs["depth"]), np.asarray(outputs["init_prob"])


def test_forward_matches_golden():
    if not os.path.exists(GOLDEN):
        pytest.skip("golden file missing — run `python tests/test_golden.py regen`")
    depth, prob = _forward()
    g = np.load(GOLDEN)
    np.testing.assert_allclose(depth, g["depth"], rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(prob, g["init_prob"], rtol=1e-3, atol=1e-3)


if __name__ == "__main__":
    import sys

    if len(sys.argv) > 1 and sys.argv[1] == "regen":
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        depth, prob = _forward()
        np.savez_compressed(GOLDEN, depth=depth, init_prob=prob)
        print(f"wrote {GOLDEN}: depth {depth.shape} "
              f"range [{depth.min():.3f}, {depth.max():.3f}]")
