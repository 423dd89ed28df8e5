"""Evaluation metrics (reference ``sg2im/metrics.py`` + PSNR for the
fidelity gate)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def intersection(bbox_pred, bbox_gt):
    """Pairwise box intersection areas (reference ``metrics.py:20-24``)."""
    max_xy = jnp.minimum(bbox_pred[..., 2:], bbox_gt[..., 2:])
    min_xy = jnp.maximum(bbox_pred[..., :2], bbox_gt[..., :2])
    inter = jnp.clip(max_xy - min_xy, 0.0)
    return inter[..., 0] * inter[..., 1]


def jaccard(bbox_pred, bbox_gt, mask=None):
    """Sum of per-box IoU (reference ``metrics.py:27-35``); optional
    validity mask for padded batches."""
    inter = intersection(bbox_pred, bbox_gt)
    area_pred = ((bbox_pred[..., 2] - bbox_pred[..., 0])
                 * (bbox_pred[..., 3] - bbox_pred[..., 1]))
    area_gt = ((bbox_gt[..., 2] - bbox_gt[..., 0])
               * (bbox_gt[..., 3] - bbox_gt[..., 1]))
    union = area_pred + area_gt - inter
    # Guard 0/0: padded rows (zero GT) with degenerate predictions (the
    # final-ReLU box head zeroes coordinates early in training) would emit
    # NaN, and NaN*mask poisons the masked sum.  Real GT boxes always have
    # positive area, so the reference (ragged, no padding) never hits this.
    iou = jnp.where(union > 0, inter / jnp.where(union > 0, union, 1.0), 0.0)
    if mask is not None:
        iou = iou * mask.astype(iou.dtype)
    return iou.sum()


def grad_global_norm(grads):
    """Global L2 norm over a gradient pytree (sane replacement for the
    reference's buggy ``get_total_norm``, ``metrics.py:37-49``)."""
    import jax

    leaves = jax.tree.leaves(grads)
    return jnp.sqrt(sum(jnp.sum(g.astype(jnp.float32) ** 2) for g in leaves))


def psnr(a, b, max_val: float = 255.0) -> float:
    """Peak signal-to-noise ratio between two images/batches (dB)."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    mse = np.mean((a - b) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(max_val * max_val / mse))
