"""tools/score_offline.py: the decoupled dump->score workflow
(/root/reference/metric.py applied to eval_hybrid_seq.py .npy dumps)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

TOOLS = os.path.join(os.path.dirname(__file__), "..", "tools")


def _dump_synthetic_preds(tmp_path, perturb=0.0, layout="flat"):
    from estdepth_tpu.data.synthetic import (
        SyntheticSceneConfig, synthetic_stream,
    )

    cfg = SyntheticSceneConfig(height=64, width=80, seed=0)
    frames = list(synthetic_stream(cfg, n_frames=6))
    rng = np.random.default_rng(0)
    for idx, f in enumerate(frames):
        pred = f["dmap"].astype(np.float32)
        if perturb:
            pred = pred * (1.0 + perturb * rng.standard_normal(pred.shape))
        pred = np.clip(pred, 0.01, None)
        if layout == "flat":
            np.save(tmp_path / f"synthetic0_{idx:06d}_depth.npy",
                    pred.astype(np.float16))
        else:
            d = tmp_path / "synthetic0" / "refined_depth"
            d.mkdir(parents=True, exist_ok=True)
            np.save(d / f"{idx:06d}.npy", pred.astype(np.float16))
    return frames


def _run(tmp_path, *extra):
    out = subprocess.run(
        [sys.executable, os.path.join(TOOLS, "score_offline.py"),
         "--preddir", str(tmp_path), "--synthetic",
         "--height", "64", "--width", "80",
         "--json", str(tmp_path / "scores.json"), *extra],
        capture_output=True, text=True,
        env=dict(os.environ, ESTDEPTH_PLATFORM="cpu"),
    )
    assert out.returncode == 0, out.stderr
    with open(tmp_path / "scores.json") as f:
        return json.load(f), out.stdout


@pytest.mark.parametrize("layout", ["flat", "reference"])
def test_exact_prediction_scores_near_zero(tmp_path, layout):
    _dump_synthetic_preds(tmp_path, perturb=0.0, layout=layout)
    scores, stdout = _run(tmp_path)
    # fp16 storage is the only error source
    assert scores["overall"]["frames"] == 6
    assert scores["overall"]["abs_relative"] < 1e-3
    assert scores["overall"]["ratio_threshold_1.25"] == 1.0
    assert "OVERALL" in stdout


def test_perturbed_prediction_and_scale_alignment(tmp_path):
    _dump_synthetic_preds(tmp_path, perturb=0.05)
    # 'log' alignment (geometric-mean scale) has no masking quirk, so for
    # unbiased multiplicative noise the aligned error cannot be much worse
    # ('abs' keeps the reference's product-range mask, metric.py:271-272,
    # which can bias the scale — preserved, not asserted on)
    scores, _ = _run(tmp_path, "--scale-align", "log")
    ov = scores["overall"]
    assert 0.005 < ov["abs_relative"] < 0.2
    assert ov["scaled_abs_relative"] <= ov["abs_relative"] * 1.1
    assert "scale" in ov


def test_inverse_mode_runs(tmp_path):
    """evaluate_depth path (metric.py:303-353): inverse depth +
    translation-norm GT rescaling."""
    _dump_synthetic_preds(tmp_path, perturb=0.02)
    scores, _ = _run(tmp_path, "--inverse")
    # frame 0 has zero translation -> unscoreable under the
    # translation-norm protocol, skipped
    assert scores["overall"]["frames"] == 5
    assert np.isfinite(scores["overall"]["abs_relative"])
