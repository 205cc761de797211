"""On-device (jnp) eval metrics.

Behavioral equivalent of DepthNetHybrid.depth_metrics / .metrics
(/root/reference/hybrid_models/model_hybrid.py:254-314): a1/a2/a3
(delta < 1.25^k), abs_diff, abs_rel, sq_rel, rmse, rmse_log per scale,
averaged over targets, using where-masked reductions.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax.numpy as jnp


def _masked_mean(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    m = mask.astype(jnp.float32)
    return jnp.sum(x.astype(jnp.float32) * m, axis=(0, 2, 3)) / jnp.maximum(
        jnp.sum(m, axis=(0, 2, 3)), 1.0
    )


def depth_metrics(
    pred_depths: jnp.ndarray,  # [B, T, S, H, W]
    gt_depth: jnp.ndarray,     # [B, T, H, W]
    gt_mask: jnp.ndarray,      # [B, T, H, W] bool
    scales: Sequence[int] = (0, 2),
) -> Dict[str, jnp.ndarray]:
    out: Dict[str, jnp.ndarray] = {}
    gt = jnp.where(gt_mask, gt_depth, 1.0)
    for s in scales:
        pred = pred_depths[:, :, s]
        pred = jnp.where(gt_mask & (pred > 0), pred, 1.0)
        thresh = jnp.maximum(gt / pred, pred / gt)
        diff = gt - pred
        out[f"a1_{s}"] = jnp.mean(_masked_mean(thresh < 1.25, gt_mask))
        out[f"a2_{s}"] = jnp.mean(_masked_mean(thresh < 1.25**2, gt_mask))
        out[f"a3_{s}"] = jnp.mean(_masked_mean(thresh < 1.25**3, gt_mask))
        out[f"abs_diff_{s}"] = jnp.mean(_masked_mean(jnp.abs(diff), gt_mask))
        out[f"abs_rel_{s}"] = jnp.mean(_masked_mean(jnp.abs(diff) / gt, gt_mask))
        out[f"sq_rel_{s}"] = jnp.mean(_masked_mean(diff**2 / gt, gt_mask))
        # rmse pools over valid pixels per target before the sqrt
        mse = _masked_mean(diff**2, gt_mask)
        out[f"rmse_{s}"] = jnp.mean(jnp.sqrt(mse))
        msle = _masked_mean((jnp.log(gt) - jnp.log(pred)) ** 2, gt_mask)
        out[f"rmse_log_{s}"] = jnp.mean(jnp.sqrt(msle))
    return out
