"""Multi-scale masked L1 depth loss + training stats.

Behavioral equivalent of DepthNetHybrid.depth_loss_scales and depth_stats
(/root/reference/hybrid_models/model_hybrid.py:186-252), rewritten with
where-masked reductions (no boolean indexing — static shapes under jit).

Reference semantics preserved:
  * per (scale, target): mean of |pred - gt| over valid pixels pooled across
    the whole batch (F.l1_loss(pred[mask], gt[mask]), :209);
  * per-scale losses averaged over targets (:218), combined with weight
    0.8**scale (:219);
  * delta (<1.25) and abs_rel stats on gt in (depth_min, depth_max) with
    pred clamped into range (:239-252).
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax.numpy as jnp


def _masked_mean_per_target(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Mean of x over valid pixels, pooled over (B, H, W) per target.

    x, mask: [B, T, H, W] -> [T].
    """
    m = mask.astype(jnp.float32)
    num = jnp.sum(x.astype(jnp.float32) * m, axis=(0, 2, 3))
    den = jnp.maximum(jnp.sum(m, axis=(0, 2, 3)), 1.0)
    return num / den


def depth_stats(
    gt: jnp.ndarray, pred: jnp.ndarray, depth_min: float, depth_max: float
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """delta<1.25 and abs_rel per target (model_hybrid.py:239-252).

    gt, pred: [B, T, H, W]. Returns ([T], [T]).
    """
    mask = (gt > depth_min) & (gt < depth_max)
    pr = jnp.clip(pred, depth_min, depth_max)
    safe_gt = jnp.where(mask, gt, 1.0)
    thresh = jnp.maximum(safe_gt / pr, pr / safe_gt)
    delta = _masked_mean_per_target((thresh < 1.25).astype(jnp.float32), mask)
    abs_rel = _masked_mean_per_target(jnp.abs(safe_gt - pr) / safe_gt, mask)
    return delta, abs_rel


def edge_aware_smoothness(
    disp: jnp.ndarray, img: jnp.ndarray
) -> jnp.ndarray:
    """Edge-aware smoothness (model_hybrid.py:224-237) — present but
    disabled in the reference training recipe (:206-208). disp: [B, H, W],
    img: [B, H, W, 3] in [-1, 1]."""
    dx = jnp.abs(disp[:, :, :-1] - disp[:, :, 1:])
    dy = jnp.abs(disp[:, :-1, :] - disp[:, 1:, :])
    gx = jnp.mean(jnp.abs(img[:, :, :-1] - img[:, :, 1:]), axis=-1)
    gy = jnp.mean(jnp.abs(img[:, :-1, :] - img[:, 1:, :]), axis=-1)
    return jnp.mean(dx * jnp.exp(-gx)) + jnp.mean(dy * jnp.exp(-gy))


def multi_scale_loss(
    pred_depths: jnp.ndarray,  # [B, T, S, H, W] (scale s at index s)
    gt_depth: jnp.ndarray,     # [B, T, H, W]
    gt_mask: jnp.ndarray,      # [B, T, H, W] bool
    depth_min: float,
    depth_max: float,
    scales: Sequence[int] = (0, 1, 2, 3),
    weight: float = 0.8,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Returns (total_loss, scalars dict)."""
    scalars: Dict[str, jnp.ndarray] = {}
    total = jnp.float32(0.0)
    for s in scales:
        pred = pred_depths[:, :, s]
        per_t = _masked_mean_per_target(jnp.abs(pred - gt_depth), gt_mask)
        loss_s = jnp.mean(per_t)
        delta, abs_rel = depth_stats(gt_depth, pred, depth_min, depth_max)
        scalars[f"loss_{s}"] = loss_s
        scalars[f"delta_{s}"] = jnp.mean(delta)
        scalars[f"thred_{s}"] = jnp.mean(abs_rel)
        total = total + (weight**s) * loss_s
    scalars["loss"] = total
    return total, scalars
