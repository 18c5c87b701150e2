"""Dense up-to-N-view benchmark: pointmap/depth/pose/ray/scale metrics.

Parity: ``benchmarking/dense_n_view/benchmark.py`` (:45 normalization,
:307 harness, :373-384 metric list): per multi-view set —
  - pointmaps_abs_rel / pointmaps_inlier_thres_103 (view-0 frame,
    GT and prediction normalized independently by avg_dis);
  - z_depth_abs_rel / z_depth_inlier_thres_103;
  - pose_ate_rmse (Horn-aligned) and pose_auc_5 (relative pose AUC@5 deg);
  - ray_dirs_err_deg (unit-ray angular error);
  - metric_scale_abs_rel (predicted vs GT scene norm factor).

Metric math runs in numpy per set (small arrays, variable view counts);
the heavy normalization uses the same jnp helpers as the loss.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

from mapanything_tpu.geometry.normalization import normalize_pointcloud
from mapanything_tpu.geometry.quaternion import (
    quat_inverse,
    quat_rotate,
    quats_trans_to_pose_matrix,
    relative_pose_quats_trans,
)
from mapanything_tpu.models.mapanything import Predictions
from mapanything_tpu.train.losses import LossBatch
from mapanything_tpu.utils.metrics import (
    calculate_auc,
    evaluate_ate,
    m_rel_ae,
    ray_angular_error_deg,
    se3_to_relative_pose_error,
    thresh_inliers,
)

METRIC_NAMES = (
    "metric_scale_abs_rel",
    "pointmaps_abs_rel",
    "pointmaps_inlier_thres_103",
    "pose_ate_rmse",
    "pose_auc_5",
    "z_depth_abs_rel",
    "z_depth_inlier_thres_103",
    "ray_dirs_err_deg",
)


def compute_set_metrics(batch: LossBatch, preds: Predictions) -> List[Dict[str, float]]:
    """Metrics for each multi-view set in the batch (reference :430-560).

    Returns a list of per-set metric dicts (length B).
    """
    import jax.numpy as jnp

    B, V = batch.valid_mask.shape[:2]

    # --- GT in view-0 frame, normalized (reference :45-160) --------------
    inv_q0 = quat_inverse(batch.camera_pose_quats[:, 0])
    t0 = batch.camera_pose_trans[:, 0]
    gt_pts_v0 = quat_rotate(
        inv_q0[:, None, None, None, :], batch.pts3d - t0[:, None, None, None, :]
    )
    q0 = jnp.broadcast_to(batch.camera_pose_quats[:, :1], batch.camera_pose_quats.shape)
    t0b = jnp.broadcast_to(batch.camera_pose_trans[:, :1], batch.camera_pose_trans.shape)
    gt_quats, gt_trans = relative_pose_quats_trans(
        q0, t0b, batch.camera_pose_quats, batch.camera_pose_trans
    )

    gt_pts_n, gt_nf = normalize_pointcloud(gt_pts_v0, batch.valid_mask, "avg_dis", True)
    gt_nf_s = np.asarray(gt_nf.reshape(B))
    gt_z = np.asarray(batch.pts3d_cam[..., 2:3] / gt_nf)
    gt_trans_n = np.asarray(gt_trans / gt_nf.reshape(B, 1, 1))

    # --- Predictions in view-0 frame, normalized -------------------------
    # (the model predicts in view-0 frame already; re-canonicalize anyway
    # for parity with the reference's pred_in_camera0 transform)
    pr_q0 = jnp.broadcast_to(preds.cam_quats[:, :1], preds.cam_quats.shape)
    pr_t0 = jnp.broadcast_to(preds.cam_trans[:, :1], preds.cam_trans.shape)
    pr_quats, pr_trans = relative_pose_quats_trans(
        pr_q0, pr_t0, preds.cam_quats, preds.cam_trans
    )
    inv_pq0 = quat_inverse(preds.cam_quats[:, 0])
    pr_pts_v0 = quat_rotate(
        inv_pq0[:, None, None, None, :],
        preds.pts3d - preds.cam_trans[:, 0][:, None, None, None, :],
    )

    pr_pts_n, pr_nf = normalize_pointcloud(pr_pts_v0, batch.valid_mask, "avg_dis", True)
    pr_nf_s = np.asarray(pr_nf.reshape(B))
    pr_z = np.asarray(preds.pts3d_cam[..., 2:3] / pr_nf)
    pr_trans_n = np.asarray(pr_trans / pr_nf.reshape(B, 1, 1))

    gt_pts_n = np.asarray(gt_pts_n)
    pr_pts_n = np.asarray(pr_pts_n)
    gt_quats_np = np.asarray(gt_quats)
    pr_quats_np = np.asarray(pr_quats)
    gt_rays = np.asarray(batch.ray_directions)
    pr_rays = np.asarray(preds.ray_directions)
    valid = np.asarray(batch.valid_mask)

    results = []
    for b in range(B):
        pm_rel, pm_inl, z_rel, z_inl, ray_err = [], [], [], [], []
        for v in range(V):
            m = valid[b, v]
            pm_rel.append(m_rel_ae(gt_pts_n[b, v], pr_pts_n[b, v], mask=m))
            pm_inl.append(thresh_inliers(gt_pts_n[b, v], pr_pts_n[b, v], 1.03, mask=m))
            z_rel.append(m_rel_ae(gt_z[b, v], pr_z[b, v], mask=m))
            z_inl.append(thresh_inliers(gt_z[b, v], pr_z[b, v], 1.03, mask=m))
            l2 = np.linalg.norm(gt_rays[b, v] - pr_rays[b, v], axis=-1)
            ray_err.append(float(np.mean(ray_angular_error_deg(l2))))

        gt_poses = np.asarray(
            quats_trans_to_pose_matrix(gt_quats_np[b], gt_trans_n[b])
        )
        pr_poses = np.asarray(
            quats_trans_to_pose_matrix(pr_quats_np[b], pr_trans_n[b])
        )
        ate = evaluate_ate(gt_poses, pr_poses)
        r_err, t_err = se3_to_relative_pose_error(pr_poses, gt_poses, V)
        auc5, _ = calculate_auc(r_err, t_err, max_threshold=5)

        scale_abs_rel = float(
            np.abs(pr_nf_s[b] * np.asarray(preds.metric_scaling_factor)[b] - gt_nf_s[b])
            / max(gt_nf_s[b], 1e-8)
        )

        results.append(
            {
                "metric_scale_abs_rel": scale_abs_rel,
                "pointmaps_abs_rel": float(np.nanmean(pm_rel)),
                "pointmaps_inlier_thres_103": float(np.nanmean(pm_inl)),
                "pose_ate_rmse": float(ate),
                "pose_auc_5": float(auc5 * 100.0),
                "z_depth_abs_rel": float(np.nanmean(z_rel)),
                "z_depth_inlier_thres_103": float(np.nanmean(z_inl)),
                "ray_dirs_err_deg": float(np.nanmean(ray_err)),
            }
        )
    return results


def run_benchmark(model, params, data_loader, loss_batch_fn, max_batches=None,
                  keep_rays=False, keep_depth=False, keep_cam=False):
    """Loop a test loader, aggregate per-scene metrics (reference :307).

    Args:
        model/params: the flagship model.
        data_loader: yields collated numpy batches with a "label" list.
        loss_batch_fn: numpy batch -> LossBatch (train.loop.loss_batch_from_numpy).
        keep_rays/keep_depth/keep_cam: which GT modalities feed the model
            (the reference's model/task presets: images_only=none,
            calibrated_sfm=rays, mvs=rays+depth, posed_sfm=rays+cam, ...).

    Returns:
        {scene: {metric: mean}} plus "overall" means.
    """
    import jax
    import jax.numpy as jnp

    from mapanything_tpu.train.step import views_from_loss_batch

    fwd = jax.jit(lambda p, v: model.apply(p, v))

    per_scene: Dict[str, Dict[str, list]] = {}
    for i, batch_np in enumerate(data_loader):
        if max_batches is not None and i >= max_batches:
            break
        batch = loss_batch_fn(batch_np)
        views = views_from_loss_batch(batch, jnp.asarray(batch_np["img"]))
        preds = fwd(params, views.replace(
            ray_directions=views.ray_directions if keep_rays else None,
            depth_along_ray=views.depth_along_ray if keep_depth else None,
            camera_pose_quats=views.camera_pose_quats if keep_cam else None,
            camera_pose_trans=views.camera_pose_trans if keep_cam else None,
        ))
        set_metrics = compute_set_metrics(batch, preds)
        labels = batch_np.get("label", [f"scene_{i}"] * len(set_metrics))
        for label, met in zip(labels, set_metrics):
            bucket = per_scene.setdefault(str(label), {k: [] for k in METRIC_NAMES})
            for k, val in met.items():
                bucket[k].append(val)

    summary = {
        scene: {k: float(np.nanmean(v)) for k, v in buckets.items()}
        for scene, buckets in per_scene.items()
    }
    overall = {
        k: float(np.nanmean([s[k] for s in summary.values()])) for k in METRIC_NAMES
    }
    summary["overall"] = overall
    return summary


def compute_set_metrics_global_pm_only(
    batch: LossBatch, pts3d_pred
) -> List[Dict[str, float]]:
    """Pointmap-only variant (reference benchmark_global_pm_only.py):
    evaluates just the normalized global pointmaps, for baselines that
    predict only a global pointcloud (no factored rays/depth/pose).

    Args:
        pts3d_pred: (B, V, H, W, 3) predicted world points (any frame that
            is consistent across views; both GT and prediction are
            re-canonicalized to view 0 and avg_dis-normalized).
    """
    import jax.numpy as jnp

    B, V = batch.valid_mask.shape[:2]
    inv_q0 = quat_inverse(batch.camera_pose_quats[:, 0])
    t0 = batch.camera_pose_trans[:, 0]
    gt_pts_v0 = quat_rotate(
        inv_q0[:, None, None, None, :],
        batch.pts3d - t0[:, None, None, None, :],
    )
    gt_pts_n, _ = normalize_pointcloud(
        gt_pts_v0, batch.valid_mask, "avg_dis", True
    )
    pr_pts_n, _ = normalize_pointcloud(
        jnp.asarray(pts3d_pred), batch.valid_mask, "avg_dis", True
    )
    gt_np = np.asarray(gt_pts_n)
    pr_np = np.asarray(pr_pts_n)
    valid = np.asarray(batch.valid_mask)

    results = []
    for b in range(B):
        pm_rel, pm_inl = [], []
        for v in range(V):
            m = valid[b, v]
            pm_rel.append(m_rel_ae(gt_np[b, v], pr_np[b, v], mask=m))
            pm_inl.append(
                thresh_inliers(gt_np[b, v], pr_np[b, v], 1.03, mask=m)
            )
        results.append(
            {
                "pointmaps_abs_rel": float(np.nanmean(pm_rel)),
                "pointmaps_inlier_thres_103": float(np.nanmean(pm_inl)),
            }
        )
    return results
