"""StableHLO serving artifacts (estdepth_tpu/serving.py).

The exported first/steady programs must reproduce a live ESTMRunner
frame-for-frame — the artifact is the deployment form of the reference's
live-process streaming loop (/root/reference/eval_hybrid_seq.py:124-193).
"""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

# jax.export round-trip + oracle verify
pytestmark = pytest.mark.slow

from estdepth_tpu.data.synthetic import SyntheticSceneConfig, synthetic_stream
from estdepth_tpu.eval.estm import ESTMRunner
from estdepth_tpu.models import DepthNetHybrid
from estdepth_tpu.serving import export_stream, load_stream


def _build(h=64, w=96, nd=8, n_frames=7):
    model = DepthNetHybrid(
        ndepths=nd, depth_min=0.5, depth_max=8.0, resnet=18,
        est_transformer=True,
    )
    cfg = SyntheticSceneConfig(height=h, width=w, focal=80.0)
    frames = list(
        synthetic_stream(cfg, n_frames=n_frames, depth_min=0.5, depth_max=8.0)
    )
    imgs0 = jnp.asarray(np.stack([f["img"] for f in frames[:3]])[None])
    poses0 = jnp.asarray(np.stack([f["cam_pose"] for f in frames[:3]])[None])
    intr0 = jnp.asarray(frames[0]["cam_intr"][None])
    variables = model.init(jax.random.key(0), imgs0, poses0, intr0, train=False)
    return model, variables, frames, (h, w)


def test_exported_stream_matches_live_runner(tmp_path):
    model, variables, frames, (h, w) = _build()
    scales = (0, 2)
    art = export_stream(
        model, variables, height=h, width=w,
        lwindow=3, memory_size=2, output_scales=scales,
    )
    outdir = str(tmp_path / "artifact")
    art.save(outdir)
    assert os.path.exists(os.path.join(outdir, "manifest.json"))

    live = ESTMRunner(model, variables, h, w, lwindow=3, memory_size=2,
                      output_scales=scales)
    exported = load_stream(outdir)

    n_depths = 0
    for f in frames:
        d_live = live.push_frame(f["img"], f["cam_pose"], f["cam_intr"])
        d_exp = exported.push_frame(f["img"], f["cam_pose"], f["cam_intr"])
        assert (d_live is None) == (d_exp is None)
        if d_live is None:
            continue
        n_depths += 1
        assert d_exp.shape == (1, len(scales), h, w)
        np.testing.assert_allclose(
            np.asarray(d_exp), np.asarray(d_live), atol=1e-5, rtol=1e-5
        )
    # first window, one EST-fused window, then steady state
    assert n_depths == len(frames) - 2

    # reset starts a fresh scene: same frames -> same depths as round 1
    exported.reset()
    live.reset()
    for f in frames[:3]:
        d_live = live.push_frame(f["img"], f["cam_pose"], f["cam_intr"])
        d_exp = exported.push_frame(f["img"], f["cam_pose"], f["cam_intr"])
    np.testing.assert_allclose(
        np.asarray(d_exp), np.asarray(d_live), atol=1e-5, rtol=1e-5
    )


def test_load_refuses_quarantined_artifact(tmp_path):
    # export_serving writes VERIFY_FAILED when the oracle check fails;
    # load_stream must refuse such artifacts rather than serve them
    bad = tmp_path / "bad"
    bad.mkdir()
    (bad / "VERIFY_FAILED").write_text("max |depth delta| 1.0e-1 > 1e-3")
    with pytest.raises(ValueError, match="failed export-time verification"):
        load_stream(str(bad))


def test_models_reexports_are_lazy():
    # serving's load path imports only the ESTMemory pytree; the lazy
    # __init__ (PEP 562) must still resolve every public name and reject
    # unknown ones
    import estdepth_tpu.models as m

    assert set(m.__all__) <= set(dir(m))
    assert m.ESTMemory is not None and m.DepthNetHybrid is not None
    with pytest.raises(AttributeError):
        m.NoSuchModel


def test_manifest_and_cross_platform_blob(tmp_path):
    model, variables, _, (h, w) = _build(n_frames=3)
    art = export_stream(
        model, variables, height=h, width=w, output_scales=(0,),
        output_dtype=jnp.bfloat16, platforms=("cpu", "tpu"),
    )
    outdir = str(tmp_path / "xplat")
    art.save(outdir)
    with open(os.path.join(outdir, "manifest.json")) as f:
        manifest = json.load(f)
    assert manifest["platforms"] == ["cpu", "tpu"]
    assert manifest["output_scales"] == [0]
    assert manifest["output_dtype"] == "bfloat16"
    assert manifest["ndepths"] == model.ndepths
    # a cross-platform artifact still loads and runs on the cpu backend
    runner = load_stream(outdir)
    rng = np.random.default_rng(1)
    intr = np.eye(3, dtype=np.float32) * 80.0
    pose = np.eye(4, dtype=np.float32)
    out = None
    for _ in range(3):
        img = rng.uniform(0, 255, size=(h, w, 3)).astype(np.float32)
        out = runner.push_frame(img, pose, intr)
    assert out is not None and out.dtype == jnp.bfloat16
    assert out.shape == (1, 1, h, w)
    assert bool(jnp.isfinite(out.astype(jnp.float32)).all())
