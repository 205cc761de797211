"""Golden parity of eval/metric_offline vs the ACTUAL reference metric.py.

/root/reference/metric.py is pure numpy and imports cleanly, so the offline
scorer is validated directly against the reference implementation — every
distance, the valid-range masking, the least-squares scale alignment
(abs/log/inv), and the full evaluate_depth flow including its quirks
(pre-mask -> optional inversion -> translation-norm GT rescaling -> re-mask
inside compute_errors).
"""

from __future__ import annotations

import numpy as np
import pytest

pytest.importorskip("torch")  # reference sys.path setup lives in the runner

from estdepth_tpu.eval import metric_offline as ours
from estdepth_tpu.utils.reference_runner import import_reference


@pytest.fixture(scope="module")
def ref_metric():
    return import_reference().metric


def _depth_pair(rng, n=4096):
    """Depth maps spanning in-range, out-of-range, and non-finite values."""
    gt = rng.uniform(0.05, 6.0, size=n)
    pred = gt * rng.uniform(0.7, 1.4, size=n) + rng.normal(0, 0.05, size=n)
    pred = np.abs(pred) + 1e-3
    gt[::97] = np.nan
    gt[1::97] = 9.0
    pred[2::97] = 0.01
    return pred, gt


def _assert_same(got: dict, want: dict):
    assert set(got) == set(want)
    for k in want:
        g, w = float(got[k]), float(want[k])
        if np.isnan(w):
            assert np.isnan(g), k
        else:
            np.testing.assert_allclose(g, w, rtol=1e-9, atol=1e-12,
                                       err_msg=k)


def test_compute_errors_matches_reference(ref_metric, rng):
    pred, gt = _depth_pair(rng)
    _assert_same(
        ours.compute_errors(pred, gt), ref_metric.compute_errors(pred, gt)
    )


def test_compute_errors_empty_mask_matches_reference(ref_metric):
    pred = np.full(64, 10.0)
    gt = np.full(64, 10.0)  # everything outside (0.3, 5.0)
    got = ours.compute_errors(pred, gt)
    want = ref_metric.compute_errors(pred, gt)
    assert got["num_valid"] == want["num_valid"] == 0
    for k in want:
        if k != "num_valid":
            assert np.isnan(got[k]) and np.isnan(want[k]), k


@pytest.mark.parametrize("scaling", ["abs", "log", "inv"])
def test_scale_factor_matches_reference(ref_metric, rng, scaling):
    pred, gt = _depth_pair(rng)
    mask = ours.valid_depth_mask(pred, gt)
    got = ours.depth_scale_factor(pred[mask], gt[mask], scaling)
    want = ref_metric.compute_depth_scale_factor(
        pred[mask], gt[mask], depth_scaling=scaling
    )
    np.testing.assert_allclose(got, want, rtol=1e-12)


@pytest.mark.parametrize(
    "inverse,tnorm,scaling",
    [
        (True, 1.0, "abs"),
        (True, 2.5, "abs"),
        (False, 1.0, "abs"),
        (False, 0.4, "log"),
        (True, 1.0, "inv"),
    ],
)
def test_evaluate_depth_matches_reference(
    ref_metric, rng, inverse, tnorm, scaling
):
    pred, gt = _depth_pair(rng)
    translation = np.array([0.6, 0.0, 0.8]) * tnorm  # norm == tnorm
    got_errs, got_scaled = ours.evaluate_depth(
        translation, gt, pred, inverse_gt=inverse, inverse_pred=inverse,
        depth_scaling=scaling,
    )
    want_errs, want_scaled = ref_metric.evaluate_depth(
        translation, gt, pred, inverse_gt=inverse, inverse_pred=inverse,
        depth_scaling=scaling,
    )
    _assert_same(got_errs, want_errs)
    _assert_same(got_scaled, want_scaled)
