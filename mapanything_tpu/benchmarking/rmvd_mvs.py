"""RobustMVD-style multi-view-stereo depth benchmark adapter.

Parity: ``benchmarking/rmvd_mvs_benchmark/benchmark.py:37`` +
``adaptors.py:20,88,191``: evaluate depth prediction in the RobustMVD
protocol — per-sample scale-invariant alignment (median-scaling when poses
are unscaled), then Absrel and inlier metrics against GT depth. The rmvd
pip library is unavailable here, so the metric definitions (Absrel, δ1.03
inliers) are implemented directly; dataset plumbing reuses our loaders.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np


def median_scale_align(pred: np.ndarray, gt: np.ndarray, mask: np.ndarray) -> float:
    """Scale factor aligning pred to gt by the ratio of medians (RMVD)."""
    p = pred[mask]
    g = gt[mask]
    if len(p) == 0 or np.median(p) <= 0:
        return 1.0
    return float(np.median(g) / np.median(p))


def rmvd_depth_metrics(
    pred_depth: np.ndarray,
    gt_depth: np.ndarray,
    mask: Optional[np.ndarray] = None,
    align_scale: bool = True,
) -> Dict[str, float]:
    """Absrel (%) and inlier ratio (δ < 1.03, %) per RobustMVD definitions.

    Args:
        pred_depth / gt_depth: (H, W) z-depth.
        mask: optional validity; GT <= 0 is always excluded.
        align_scale: median-scale pred to GT first (the benchmark's
            treatment of scale-ambiguous predictions).
    """
    valid = gt_depth > 0
    if mask is not None:
        valid = valid & mask
    if not valid.any():
        return {"absrel": np.nan, "inlier103": np.nan, "scale": np.nan}

    scale = median_scale_align(pred_depth, gt_depth, valid) if align_scale else 1.0
    p = pred_depth * scale

    with np.errstate(divide="ignore", invalid="ignore"):
        absrel = np.abs(p - gt_depth) / gt_depth
        ratio = np.maximum(
            np.nan_to_num(p / gt_depth, nan=np.inf),
            np.nan_to_num(gt_depth / np.maximum(p, 1e-9), nan=np.inf),
        )
    return {
        "absrel": float(np.mean(absrel[valid]) * 100.0),
        "inlier103": float(np.mean(ratio[valid] < 1.03) * 100.0),
        "scale": scale,
    }


def run_benchmark(model, params, data_loader, max_batches=None) -> Dict[str, float]:
    """Evaluate z-depth on a loader of collated batches (keyframe = view 0)."""
    import jax
    import jax.numpy as jnp

    from mapanything_tpu.models.mapanything import Views

    fwd = jax.jit(lambda p, v: model.apply(p, v))
    absrels, inliers = [], []
    for i, batch_np in enumerate(data_loader):
        if max_batches is not None and i >= max_batches:
            break
        preds = fwd(params, Views(img=jnp.asarray(batch_np["img"])))
        pred_z = np.asarray(preds.pts3d_cam[..., 2])
        gt_z = np.asarray(batch_np["pts3d_cam"][..., 2])
        valid = np.asarray(batch_np["valid_mask"])
        B = pred_z.shape[0]
        for b in range(B):
            m = rmvd_depth_metrics(pred_z[b, 0], gt_z[b, 0], valid[b, 0])
            absrels.append(m["absrel"])
            inliers.append(m["inlier103"])
    return {
        "absrel": float(np.nanmean(absrels)),
        "inlier103": float(np.nanmean(inliers)),
        "num_samples": len(absrels),
    }
