"""Day-one released-checkpoint path (tools/rehearse_release_ckpt.py).

The real released .ckpt cannot be downloaded in this environment, so the
rehearsal generates one by executing the reference's OWN model code and
torch.save layout (train_hybrid.py:137-142), then drives ckpt -> convert ->
ESTM eval. This pins the whole chain so the real artifact is a drop-in.
"""

from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")

# end-to-end ckpt->convert->eval->score rehearsal
pytestmark = pytest.mark.slow

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from estdepth_tpu.models import DepthNetHybrid  # noqa: E402
from estdepth_tpu.utils.convert import (  # noqa: E402
    flatten_tree,
    load_torch_checkpoint,
)
from tools.rehearse_release_ckpt import generate_reference_ckpt  # noqa: E402


@pytest.fixture(scope="module")
def ref_ckpt(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("release") / "model_000006.ckpt")
    # small config: generation only calls the reference model's
    # constructor + state_dict (its forward's ndepths>=63 quirk is
    # irrelevant here)
    generate_reference_ckpt(path, ndepths=8, depth_min=0.5, depth_max=8.0,
                            resnet=18)
    return path


def test_reference_ckpt_layout(ref_ckpt):
    """The generated artifact has exactly the reference's save layout
    (train_hybrid.py:137-142) so eval_hybrid's load path would accept it."""
    sd = torch.load(ref_ckpt, map_location="cpu")
    assert set(sd) == {"epoch", "model", "optimizer"}
    assert isinstance(sd["epoch"], int)
    # the keys eval_hybrid.py:328-333 reads
    assert any(k.startswith("matchingFeature") or "feature" in k.lower()
               or "." in k for k in sd["model"])


def test_convert_covers_every_torch_key(ref_ckpt):
    """Every torch model key converts (except BN's num_batches_tracked,
    which has no JAX counterpart) — the layout-drift gate for day one."""
    variables, unmatched = load_torch_checkpoint(ref_ckpt, strict=False)
    real = [k for k in unmatched if not k.endswith("num_batches_tracked")]
    assert real == [], real
    assert flatten_tree(variables["params"])
    assert flatten_tree(variables["batch_stats"])


def test_convert_matches_model_tree_and_runs(ref_ckpt):
    """Converted variables drop into DepthNetHybrid leaf-for-leaf and the
    ESTM streaming model runs with them (finite full-res depth)."""
    variables, _ = load_torch_checkpoint(ref_ckpt, strict=False)

    h, w, nd = 64, 96, 8
    model = DepthNetHybrid(ndepths=nd, depth_min=0.5, depth_max=8.0,
                           resnet=18, est_transformer=True)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(0, 255, (1, 3, h, w, 3))
                       .astype(np.float32))
    poses = np.tile(np.eye(4, dtype=np.float32)[None, None], (1, 3, 1, 1))
    for i in range(3):
        poses[0, i, 0, 3] = 0.04 * i
    intr = jnp.asarray(np.array(
        [[[80.0, 0, (w - 1) / 2], [0, 80.0, (h - 1) / 2], [0, 0, 1]]],
        np.float32,
    ))
    init_vars = jax.jit(
        lambda r: model.init(r, imgs, jnp.asarray(poses), intr, train=False)
    )(jax.random.key(0))

    # leaf-for-leaf tree match (shapes + names both directions)
    for col in ("params", "batch_stats"):
        want = flatten_tree(jax.tree.map(np.asarray, dict(init_vars))[col])
        got = flatten_tree(variables[col])
        assert set(got) == set(want), (
            set(want) ^ set(got))
        for k in want:
            assert got[k].shape == want[k].shape, k

    out, (key, val, pose) = jax.jit(
        lambda v: model.apply(v, imgs, jnp.asarray(poses), intr,
                              train=False, use_est=False)
    )({"params": variables["params"],
       "batch_stats": variables["batch_stats"]})
    depth = np.asarray(out["depth"])
    assert depth.shape[-2:] == (h, w)
    assert np.isfinite(depth).all()
    assert (depth >= 0).all() and (depth <= 8.0 + 1e-3).all()
