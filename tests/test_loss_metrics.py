"""Loss / metric correctness vs direct numpy computations."""

import numpy as np

import jax.numpy as jnp

from estdepth_tpu.eval.metric_offline import (
    compute_errors,
    evaluate_depth_metric,
)
from estdepth_tpu.eval.metrics import depth_metrics
from estdepth_tpu.train.loss import multi_scale_loss


def test_multi_scale_loss_matches_numpy(rng):
    b, t, s, h, w = 2, 3, 4, 8, 10
    pred = rng.uniform(0.5, 5.0, size=(b, t, s, h, w)).astype(np.float32)
    gt = rng.uniform(0.5, 5.0, size=(b, t, h, w)).astype(np.float32)
    mask = rng.uniform(size=(b, t, h, w)) > 0.3

    total, scalars = multi_scale_loss(
        jnp.array(pred), jnp.array(gt), jnp.array(mask), 0.01, 10.0
    )

    want_total = 0.0
    for sc in range(4):
        per_t = []
        for ti in range(t):
            m = mask[:, ti]
            per_t.append(np.abs(pred[:, ti, sc][m] - gt[:, ti][m]).mean())
        loss_s = np.mean(per_t)
        np.testing.assert_allclose(float(scalars[f"loss_{sc}"]), loss_s, rtol=1e-5)
        want_total += 0.8**sc * loss_s
    np.testing.assert_allclose(float(total), want_total, rtol=1e-5)


def test_loss_empty_mask_is_finite():
    pred = jnp.ones((1, 1, 4, 4, 4))
    gt = jnp.ones((1, 1, 4, 4))
    mask = jnp.zeros((1, 1, 4, 4), bool)
    total, scalars = multi_scale_loss(pred, gt, mask, 0.01, 10.0)
    assert np.isfinite(float(total))


def test_depth_metrics_matches_numpy(rng):
    b, t, h, w = 1, 2, 12, 16
    pred = rng.uniform(0.5, 5.0, size=(b, t, 4, h, w)).astype(np.float32)
    gt = rng.uniform(0.5, 5.0, size=(b, t, h, w)).astype(np.float32)
    mask = rng.uniform(size=(b, t, h, w)) > 0.4

    m = depth_metrics(jnp.array(pred), jnp.array(gt), jnp.array(mask), scales=(0,))

    a1s, absrels, rmses = [], [], []
    for ti in range(t):
        mm = mask[:, ti]
        g, p = gt[:, ti][mm], pred[:, ti, 0][mm]
        thr = np.maximum(g / p, p / g)
        a1s.append((thr < 1.25).mean())
        absrels.append((np.abs(g - p) / g).mean())
        rmses.append(np.sqrt(((g - p) ** 2).mean()))
    np.testing.assert_allclose(float(m["a1_0"]), np.mean(a1s), rtol=1e-5)
    np.testing.assert_allclose(float(m["abs_rel_0"]), np.mean(absrels), rtol=1e-5)
    np.testing.assert_allclose(float(m["rmse_0"]), np.mean(rmses), rtol=1e-5)


def test_offline_metrics_perfect_prediction(rng):
    gt = rng.uniform(0.5, 4.5, size=(64, 64)).astype(np.float64)
    res = compute_errors(gt.copy(), gt.copy())
    assert res["num_valid"] > 0
    for k in ("l1", "rmse", "abs_relative", "scale_invariant"):
        assert abs(res[k]) < 1e-9
    assert res["ratio_threshold_1.25"] == 1.0


def test_offline_metrics_known_bias(rng):
    gt = np.full((32, 32), 2.0)
    pred = np.full((32, 32), 2.2)  # +10%
    res = compute_errors(pred, gt)
    np.testing.assert_allclose(res["l1"], 0.2, rtol=1e-6)
    np.testing.assert_allclose(res["abs_relative"], 0.1, rtol=1e-6)
    np.testing.assert_allclose(res["rmse"], 0.2, rtol=1e-6)
    # scale-invariant error of a constant-ratio prediction is zero
    assert res["scale_invariant"] < 1e-7
    # optimal scaling removes the bias entirely
    _, scaled = evaluate_depth_metric(gt, pred)
    assert scaled["abs_relative"] < 1e-7


def test_offline_metrics_masking():
    gt = np.array([0.1, 1.0, 2.0, 6.0])  # 0.1 and 6.0 outside (0.3, 5.0)
    pred = np.array([1.0, 1.0, 2.0, 1.0])
    res = compute_errors(pred, gt)
    assert res["num_valid"] == 2
    assert res["l1"] == 0.0
