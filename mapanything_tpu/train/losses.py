"""Training losses: factored-geometry regression + confidence/robust wrappers.

Capability parity with the production loss of the reference
(``mapanything/train/losses.py``; production string in
``configs/loss/overall_loss.yaml``):

    ConfAndExcludeTopNPercentPixelLoss(
        FactoredGeometryScaleRegr3DPlusNormalGMLoss(
            RobustRegressionLoss(alpha=0.5, scaling_c=0.05),
            norm_mode='avg_dis', depth_type_for_loss='depth_along_ray',
            loss_in_log=True, flatten_across_image_only=True,
            compute_world_frame_points_loss=True,
            apply_normal_and_gm_loss_to_synthetic_data_only=True,
            normal_loss_weight=3.0, gm_loss_weight=3.0),
        conf_alpha=0.2, top_n_percent=5, apply_to_real_data_only=True,
        conf_loss_set_indices=[0], exclude_loss_set_indices=[1, 2])
    + 0.3 * NonAmbiguousMaskLoss(BCELoss())

TPU-first redesign: the reference's Python loss-DSL with boolean indexing
becomes one pure function over stacked (B, V, ...) arrays. All reductions
are mask-weighted means (static shapes); the top-N%-exclusion uses a
per-image sort instead of data-dependent gather. Everything jits and
differentiates as a single fused program.

Loss-set indexing parity (losses.py:2231-2237): set 0 = world points,
1 = cam points, 2 = depth, 3 = ray dirs, 4 = pose quats, 5 = pose trans,
6 = scale (+ normal & gradient-matching terms from the NormalGM variant).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp

from mapanything_tpu.geometry.normalization import (
    apply_log_to_norm,
    normalize_pointcloud,
    safe_norm,
)
from mapanything_tpu.geometry.quaternion import (
    quat_inverse,
    quat_rotate,
    relative_pose_quats_trans,
)
from mapanything_tpu.models.mapanything import Predictions


# --------------------------------------------------------------------------
# Batch pytree (ground truth)
# --------------------------------------------------------------------------


@flax.struct.dataclass
class LossBatch:
    """Ground truth for the loss, all stacked (B, V, ...).

    Mirrors the per-view dict fields consumed by the reference loss
    (losses.py:2294-2376): world pointmaps, camera pointmaps, depth along
    ray, unit ray directions, cam2world poses, validity / ambiguity masks,
    and per-sample metric/synthetic flags.
    """

    pts3d: jnp.ndarray  # (B, V, H, W, 3) world frame (GT world)
    pts3d_cam: jnp.ndarray  # (B, V, H, W, 3)
    depth_along_ray: jnp.ndarray  # (B, V, H, W, 1)
    ray_directions: jnp.ndarray  # (B, V, H, W, 3)
    camera_pose_quats: jnp.ndarray  # (B, V, 4) cam2world
    camera_pose_trans: jnp.ndarray  # (B, V, 3)
    valid_mask: jnp.ndarray  # (B, V, H, W) bool
    non_ambiguous_mask: jnp.ndarray  # (B, V, H, W) bool
    valid_non_ambiguous_mask: jnp.ndarray  # (B, V, H, W) bool
    is_metric_scale: jnp.ndarray  # (B,) bool
    is_synthetic: jnp.ndarray  # (B,) bool
    target_rgb: Optional[jnp.ndarray] = None  # (B, V, H, W, 3) in [0, 1] [FORK]


@dataclass(frozen=True)
class LossConfig:
    """Production loss hyperparameters (overall_loss.yaml)."""

    criterion: str = "robust"  # robust | l1 | l2 (FactoredLLoss parity)
    # Disentangled ablation (reference losses.py:4521): each factor's loss
    # is computed in WORLD-POINTMAP space using GT for the other factors.
    disentangled: bool = False
    robust_alpha: float = 0.5
    robust_scaling_c: float = 0.05
    norm_mode: str = "avg_dis"
    loss_in_log: bool = True
    conf_alpha: float = 0.2
    top_n_percent: float = 5.0
    apply_exclusion_to_real_data_only: bool = True
    normal_loss_weight: float = 3.0
    gm_loss_weight: float = 3.0
    gm_scales: int = 4
    apply_normal_gm_to_synthetic_only: bool = True
    mask_loss_weight: float = 0.3
    rgb_loss_weight: float = 1.0  # [FORK] RGB prediction loss
    # term weights (all 1 in production)
    world_points_weight: float = 1.0
    cam_points_weight: float = 1.0
    depth_weight: float = 1.0
    ray_directions_weight: float = 1.0
    pose_quats_weight: float = 1.0
    pose_trans_weight: float = 1.0
    scale_weight: float = 1.0


# --------------------------------------------------------------------------
# Small helpers
# --------------------------------------------------------------------------


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray, axis=None) -> jnp.ndarray:
    """Mean of x over mask==True; 0 when the mask is empty."""
    num = jnp.sum(jnp.where(mask, x, 0.0), axis=axis)
    den = jnp.sum(mask, axis=axis)
    return num / jnp.maximum(den, 1)


def robust_regression_distance(
    a: jnp.ndarray, b: jnp.ndarray, alpha: float, scaling_c: float
) -> jnp.ndarray:
    """Barron's general robust loss (arXiv:1701.03077; losses.py:415-440).

    Reduces the channel dim: (..., C) -> (...).
    """
    err = jnp.sum(jnp.square((a - b) / scaling_c), axis=-1)
    am2 = abs(alpha - 2)
    return (am2 / alpha) * (jnp.power(err / am2 + 1.0, alpha / 2) - 1.0)


def bce_with_logits(logits: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Numerically stable binary cross entropy with logits."""
    return jnp.maximum(logits, 0) - logits * target + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def _smooth_l1_angle(err: jnp.ndarray, beta: float) -> jnp.ndarray:
    """Huber-like smoothing of angular errors (losses.py:104)."""
    return jnp.where(err < beta, 0.5 * jnp.square(err) / beta, err - 0.5 * beta)


def _angle_diff(v1, v2, eps=1e-12):
    cross = safe_norm(jnp.cross(v1, v2), axis=-1)
    dot = jnp.sum(v1 * v2, axis=-1)
    return jnp.arctan2(cross, dot + eps)


def compute_normal_loss(points, gt_points, mask) -> jnp.ndarray:
    """Quad-cross-product normal consistency loss (losses.py:111; MoGe).

    points/gt_points: (..., H, W, 3); mask: (..., H, W). Returns a scalar.
    """
    lu = points[..., :-1, :-1, :]
    ru = points[..., :-1, 1:, :]
    ld = points[..., 1:, :-1, :]
    rd = points[..., 1:, 1:, :]
    glu = gt_points[..., :-1, :-1, :]
    gru = gt_points[..., :-1, 1:, :]
    gld = gt_points[..., 1:, :-1, :]
    grd = gt_points[..., 1:, 1:, :]

    crosses = [
        (jnp.cross(ru - rd, ld - rd), jnp.cross(gru - grd, gld - grd)),
        (jnp.cross(lu - ru, rd - ru), jnp.cross(glu - gru, grd - gru)),
        (jnp.cross(ld - lu, ru - lu), jnp.cross(gld - glu, gru - glu)),
        (jnp.cross(rd - ld, lu - ld), jnp.cross(grd - gld, glu - gld)),
    ]
    m_lu = mask[..., :-1, :-1]
    m_ru = mask[..., :-1, 1:]
    m_ld = mask[..., 1:, :-1]
    m_rd = mask[..., 1:, 1:]
    quad_masks = [
        m_ru & m_ld & m_rd,
        m_lu & m_rd & m_ru,
        m_ld & m_ru & m_lu,
        m_rd & m_lu & m_ld,
    ]

    min_a, max_a, beta = math.radians(1), math.radians(90), math.radians(3)
    loss = 0.0
    for (pred_n, gt_n), qm in zip(crosses, quad_masks):
        ang = jnp.clip(_angle_diff(pred_n, gt_n), min_a, max_a)
        loss = loss + qm * _smooth_l1_angle(ang, beta)

    total_valid = quad_masks[0] | quad_masks[1] | quad_masks[2] | quad_masks[3]
    count = jnp.sum(total_valid)
    denom = jnp.maximum(count, 1) * (4 * max(points.shape[-3:-1]))
    return jnp.where(count > 0, jnp.sum(loss) / denom, 0.0)


def compute_gradient_matching_loss(
    prediction, gt_target, mask, scales: int = 4
) -> jnp.ndarray:
    """Multi-scale gradient matching on log-depth (MiDaS eq. 11; losses.py:246).

    prediction/gt_target: (B, H, W, C); mask: (B, H, W). Returns a scalar.
    """

    def one_scale(pred, gt, m):
        m = m[..., None]
        diff = jnp.where(m, pred - gt, 0.0)
        gx = jnp.abs(diff[:, :, 1:] - diff[:, :, :-1]) * (m[:, :, 1:] & m[:, :, :-1])
        gy = jnp.abs(diff[:, 1:, :] - diff[:, :-1, :]) * (m[:, 1:, :] & m[:, :-1, :])
        gx = jnp.minimum(gx, 100.0)
        gy = jnp.minimum(gy, 100.0)
        total = jnp.sum(gx) + jnp.sum(gy)
        count = jnp.sum(m)
        return jnp.where(count > 0, total / jnp.maximum(count, 1), 0.0)

    loss = 0.0
    for s in range(scales):
        step = 2**s
        loss = loss + one_scale(
            prediction[:, ::step, ::step], gt_target[:, ::step, ::step],
            mask[:, ::step, ::step],
        )
    return loss


def exclude_top_n_percent_mean(
    loss: jnp.ndarray, valid: jnp.ndarray, bottom_percent: float
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-row mean over the lowest ``bottom_percent``% of valid entries.

    Static-shape version of ``keep_bottom_n_percent`` (losses.py:1083): sort
    with +inf at invalid, keep the first floor(valid * pct) entries per row.

    Args:
        loss: (R, N); valid: (R, N) bool.
    Returns:
        (per-row mean (R,), per-row has-any-valid (R,) bool)
    """
    r, n = loss.shape
    num_valid = jnp.sum(valid, axis=1)
    num_keep = jnp.floor(num_valid * bottom_percent / 100.0).astype(jnp.int32)
    masked = jnp.where(valid, loss, jnp.inf)
    sorted_loss = jnp.sort(masked, axis=1)
    idx = jax.lax.broadcasted_iota(jnp.int32, (r, n), 1)
    keep = idx < num_keep[:, None]
    mean = masked_mean(jnp.where(keep, sorted_loss, 0.0), keep, axis=1)
    return mean, num_keep > 0


# --------------------------------------------------------------------------
# The production loss
# --------------------------------------------------------------------------


def factored_geometry_scale_loss(
    batch: LossBatch,
    preds: Predictions,
    cfg: LossConfig = LossConfig(),
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Compute the full production training loss. Returns (scalar, details).

    Follows FactoredGeometryScaleRegr3DPlusNormalGMLoss + Conf/ExcludeTopN
    wrappers + NonAmbiguousMaskLoss, vectorized over the view axis.
    """
    if cfg.disentangled:
        return disentangled_factored_geometry_scale_loss(batch, preds, cfg)
    B, V, H, W, _ = batch.pts3d.shape
    P = H * W
    if cfg.criterion == "robust":
        crit = lambda a, b: robust_regression_distance(
            a, b, cfg.robust_alpha, cfg.robust_scaling_c
        )
    elif cfg.criterion == "l1":
        crit = lambda a, b: jnp.sum(jnp.abs(a - b), axis=-1)
    elif cfg.criterion == "l2":
        crit = lambda a, b: safe_norm(a - b, axis=-1)
    else:
        raise ValueError(f"unknown criterion {cfg.criterion}")

    valid = batch.valid_mask  # (B, V, H, W)

    # --- GT in view-0 frame (losses.py get_all_info) ---------------------
    q0 = jnp.broadcast_to(batch.camera_pose_quats[:, :1], batch.camera_pose_quats.shape)
    t0 = jnp.broadcast_to(batch.camera_pose_trans[:, :1], batch.camera_pose_trans.shape)
    gt_quats, gt_trans = relative_pose_quats_trans(
        q0, t0, batch.camera_pose_quats, batch.camera_pose_trans
    )
    # World pts -> view-0 camera frame: inv(pose0) applied.
    inv_q0 = quat_inverse(batch.camera_pose_quats[:, 0])
    t_b = batch.camera_pose_trans[:, 0]
    gt_pts_v0 = quat_rotate(
        inv_q0[:, None, None, None, :], batch.pts3d - t_b[:, None, None, None, :]
    )

    # --- Predictions: un-scale by the (detached) metric factor -----------
    s = preds.metric_scaling_factor  # (B,)
    s_stop = jax.lax.stop_gradient(s)
    s5 = s[:, None, None, None, None]
    pr_pts = preds.pts3d / s5
    pr_pts_cam = preds.pts3d_cam / s5
    pr_depth = preds.depth_along_ray / s5
    pr_trans = preds.cam_trans / s[:, None, None]
    pr_quats = preds.cam_quats
    pr_rays = preds.ray_directions

    # --- Joint multi-view normalization (avg_dis), independent GT/pred ---
    gt_pts_n, gt_nf = normalize_pointcloud(gt_pts_v0, valid, cfg.norm_mode, True)
    gt_nf_s = gt_nf.reshape(B)  # scalar factor per batch elem
    gt_pts_cam_n = batch.pts3d_cam / gt_nf
    gt_depth_n = batch.depth_along_ray / gt_nf
    gt_trans_n = gt_trans / gt_nf_s[:, None, None]

    pr_pts_n, pr_nf = normalize_pointcloud(pr_pts, valid, cfg.norm_mode, True)
    pr_nf_s = pr_nf.reshape(B)
    pr_pts_cam_n = pr_pts_cam / pr_nf
    pr_depth_n = pr_depth / pr_nf
    pr_trans_n = pr_trans / pr_nf_s[:, None, None]

    # --- Scale loss ingredients (losses.py FactoredGeometryScaleRegr3D) --
    # predicted metric norm factor: normalize stop_grad(geometry) * scale
    metric_pr_pts = jax.lax.stop_gradient(pr_pts) * s[:, None, None, None, None]
    _, pr_metric_nf = normalize_pointcloud(metric_pr_pts, valid, cfg.norm_mode, True)
    pr_metric_nf_s = pr_metric_nf.reshape(B)
    valid_gt_nf = gt_nf_s > 1e-8
    metric_sample = batch.is_metric_scale & valid_gt_nf  # (B,)

    # --- Optional log-space transform ------------------------------------
    if cfg.loss_in_log:
        gt_depth_l = apply_log_to_norm(gt_depth_n)
        pr_depth_l = apply_log_to_norm(pr_depth_n)
        gt_pts_cam_l = apply_log_to_norm(gt_pts_cam_n)
        pr_pts_cam_l = apply_log_to_norm(pr_pts_cam_n)
        gt_pts_l = apply_log_to_norm(gt_pts_n)
        pr_pts_l = apply_log_to_norm(pr_pts_n)
    else:
        gt_depth_l, pr_depth_l = gt_depth_n, pr_depth_n
        gt_pts_cam_l, pr_pts_cam_l = gt_pts_cam_n, pr_pts_cam_n
        gt_pts_l, pr_pts_l = gt_pts_n, pr_pts_n

    # --- Per-pixel losses (flatten_across_image_only=True layout) --------
    flat = lambda x: x.reshape(B, V, P, x.shape[-1])
    valid_flat = valid.reshape(B, V, P)

    pts3d_pix = crit(flat(pr_pts_l), flat(gt_pts_l)) * cfg.world_points_weight
    cam_pts_pix = crit(flat(pr_pts_cam_l), flat(gt_pts_cam_l)) * cfg.cam_points_weight
    depth_pix = crit(flat(pr_depth_l), flat(gt_depth_l)) * cfg.depth_weight
    rays_pix = crit(flat(pr_rays), flat(batch.ray_directions)) * cfg.ray_directions_weight

    # Pose losses (per (B, V)); quats handle double cover via min(+/-q).
    quats_loss = jnp.minimum(crit(pr_quats, gt_quats), crit(pr_quats, -gt_quats))
    quats_loss = quats_loss * cfg.pose_quats_weight  # (B, V)
    trans_loss = crit(pr_trans_n, gt_trans_n) * cfg.pose_trans_weight  # (B, V)
    # Translation masked by per-view any-valid-depth (valid_norm_factor_masks)
    view_has_valid = jnp.sum(valid_flat, axis=2) > 0  # (B, V)

    # Aggregation parity: the reference wrappers add each (set, view) term's
    # mean separately (get_loss_terms_and_details), so per-set totals are
    # per-view pixel-weighted means SUMMED over views; the train loop later
    # rescales by 2 / n_views (training.py:475-478).
    details: Dict[str, jnp.ndarray] = {}
    total = 0.0

    # Set 0: world points with confidence weighting (conf_loss_set_indices=[0])
    conf = preds.conf.reshape(B, V, P)
    conf_weighted = pts3d_pix * conf - cfg.conf_alpha * jnp.log(conf)
    pts3d_loss = jnp.sum(masked_mean(conf_weighted, valid_flat, axis=(0, 2)))
    total = total + pts3d_loss
    details["pts3d_conf_loss"] = pts3d_loss

    # Sets 1, 2: cam points + depth with top-N% exclusion on real data.
    # Per view: pixel-weighted mean over {all synthetic pixels} union
    # {bottom-N% pixels of each real image} (losses.py:1121-1174).
    def excluded_view_sum(pix_loss):
        rows = pix_loss.reshape(B * V, P)
        vrows = valid_flat.reshape(B * V, P)
        n = rows.shape[1]
        num_valid = jnp.sum(vrows, axis=1)
        num_keep = jnp.floor(
            num_valid * (100.0 - cfg.top_n_percent) / 100.0
        ).astype(jnp.int32)
        masked = jnp.where(vrows, rows, jnp.inf)
        sorted_loss = jnp.sort(masked, axis=1)
        idx = jax.lax.broadcasted_iota(jnp.int32, (B * V, n), 1)
        keep = idx < num_keep[:, None]
        if cfg.apply_exclusion_to_real_data_only:
            synth = jnp.repeat(batch.is_synthetic[:, None], V, 1).reshape(B * V, 1)
            kept_sum = jnp.where(
                synth[:, 0],
                jnp.sum(jnp.where(vrows, rows, 0.0), axis=1),
                jnp.sum(jnp.where(keep, sorted_loss, 0.0), axis=1),
            )
            kept_cnt = jnp.where(synth[:, 0], num_valid, num_keep)
        else:
            kept_sum = jnp.sum(jnp.where(keep, sorted_loss, 0.0), axis=1)
            kept_cnt = num_keep
        kept_sum = kept_sum.reshape(B, V)
        kept_cnt = kept_cnt.reshape(B, V)
        view_mean = jnp.sum(kept_sum, axis=0) / jnp.maximum(jnp.sum(kept_cnt, axis=0), 1)
        return jnp.sum(view_mean)

    cam_pts_loss = excluded_view_sum(cam_pts_pix)
    depth_loss = excluded_view_sum(depth_pix)
    total = total + cam_pts_loss + depth_loss
    details["cam_pts3d_loss"] = cam_pts_loss
    details["depth_loss"] = depth_loss

    # Set 3: ray directions (no pixel mask)
    rays_loss = jnp.sum(jnp.mean(rays_pix, axis=(0, 2)))
    total = total + rays_loss
    details["ray_dirs_loss"] = rays_loss

    # Sets 4, 5: pose quats and translations
    pose_quats_loss = jnp.sum(jnp.mean(quats_loss, axis=0))
    pose_trans_loss = jnp.sum(masked_mean(trans_loss, view_has_valid, axis=0))
    total = total + pose_quats_loss + pose_trans_loss
    details["pose_quats_loss"] = pose_quats_loss
    details["pose_trans_loss"] = pose_trans_loss

    # Set 6: scale (metric samples only; log space)
    if cfg.loss_in_log:
        gt_sc = jnp.log1p(gt_nf_s)[:, None]
        pr_sc = jnp.log1p(pr_metric_nf_s)[:, None]
    else:
        gt_sc = gt_nf_s[:, None]
        pr_sc = pr_metric_nf_s[:, None]
    scale_pix = crit(pr_sc, gt_sc) * cfg.scale_weight  # (B,)
    scale_loss = masked_mean(scale_pix, metric_sample)
    total = total + scale_loss
    details["scale_loss"] = scale_loss

    # Normal + gradient-matching losses (synthetic-only in production).
    # Per-view scalars summed over views (the reference loops views).
    ngm_mask = valid
    if cfg.apply_normal_gm_to_synthetic_only:
        ngm_mask = ngm_mask & batch.is_synthetic[:, None, None, None]
    pr_z = apply_log_to_norm(pr_pts_cam_n[..., 2:])
    gt_z = apply_log_to_norm(gt_pts_cam_n[..., 2:])
    per_view_normal = jax.vmap(compute_normal_loss, in_axes=(1, 1, 1))(
        pr_pts_cam_n, gt_pts_cam_n, ngm_mask
    )
    normal_loss = jnp.sum(per_view_normal) * cfg.normal_loss_weight
    per_view_gm = jax.vmap(
        lambda p, g, m: compute_gradient_matching_loss(p, g, m, cfg.gm_scales),
        in_axes=(1, 1, 1),
    )(pr_z, gt_z, ngm_mask)
    gm_loss = jnp.sum(per_view_gm) * cfg.gm_loss_weight
    total = total + normal_loss + gm_loss
    details["normal_loss"] = normal_loss
    details["gm_loss"] = gm_loss

    # [FORK] RGB color regression (RGBColorRegressionLoss, losses.py:769):
    # per-view masked L1 between predicted RGB (in [0, 1]) and the target
    # image, applied where the view is valid.
    if preds.rgb is not None and batch.target_rgb is not None:
        rgb_l1 = jnp.sum(jnp.abs(preds.rgb - batch.target_rgb), axis=-1)
        rgb_loss = jnp.sum(masked_mean(rgb_l1, valid, axis=(0, 2, 3)))
        total = total + cfg.rgb_loss_weight * rgb_loss
        details["rgb_loss"] = rgb_loss

    # Non-ambiguous mask BCE (NonAmbiguousMaskLoss, losses.py:719)
    if preds.non_ambiguous_mask_logits is not None:
        bce = bce_with_logits(
            preds.non_ambiguous_mask_logits,
            batch.non_ambiguous_mask.astype(jnp.float32),
        )
        mask_loss = jnp.sum(
            masked_mean(bce, batch.valid_non_ambiguous_mask, axis=(0, 2, 3))
        )
        total = total + cfg.mask_loss_weight * mask_loss
        details["mask_loss"] = mask_loss

    details["total_loss"] = total
    return total, details


def disentangled_factored_geometry_scale_loss(
    batch: LossBatch,
    preds: Predictions,
    cfg: LossConfig = LossConfig(),
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """DisentangledFactoredGeometryScaleRegr3D (reference losses.py:4521).

    Each factor's contribution is isolated by reconstructing the
    view-0-frame WORLD pointmap with that factor PREDICTED and all other
    factors taken from GT (Simonelli et al., ICCV 2019): depth, ray
    directions, pose quats, pose trans each get a pointmap-space term;
    scale is supervised as in the entangled loss. Same criterion /
    normalization / log-space knobs as the production loss.
    """
    from mapanything_tpu.geometry.camera import pointmap_from_rays_depth_pose

    B, V, H, W, _ = batch.pts3d.shape
    if cfg.criterion == "robust":
        crit = lambda a, b: robust_regression_distance(
            a, b, cfg.robust_alpha, cfg.robust_scaling_c
        )
    elif cfg.criterion == "l1":
        crit = lambda a, b: jnp.sum(jnp.abs(a - b), axis=-1)
    else:
        crit = lambda a, b: safe_norm(a - b, axis=-1)
    valid = batch.valid_mask

    # GT factors in the view-0 frame.
    q0 = jnp.broadcast_to(
        batch.camera_pose_quats[:, :1], batch.camera_pose_quats.shape
    )
    t0 = jnp.broadcast_to(
        batch.camera_pose_trans[:, :1], batch.camera_pose_trans.shape
    )
    gt_quats, gt_trans = relative_pose_quats_trans(
        q0, t0, batch.camera_pose_quats, batch.camera_pose_trans
    )
    gt_rays = batch.ray_directions
    gt_depth = batch.depth_along_ray

    # Predicted factors, un-scaled by the (stop-grad) metric factor.
    sc = preds.metric_scaling_factor
    pr_depth = preds.depth_along_ray / sc[:, None, None, None, None]
    pr_trans = preds.cam_trans / sc[:, None, None]
    pr_rays = preds.ray_directions
    pr_quats = preds.cam_quats

    inv_q0 = quat_inverse(batch.camera_pose_quats[:, 0])
    gt_pts_v0 = quat_rotate(
        inv_q0[:, None, None, None, :],
        batch.pts3d - batch.camera_pose_trans[:, 0][:, None, None, None, :],
    )
    gt_pts_n, gt_nf = normalize_pointcloud(gt_pts_v0, valid, cfg.norm_mode, True)
    gt_nf_s = gt_nf.reshape(B)
    gt_trans_n = gt_trans / gt_nf_s[:, None, None]
    gt_depth_n = gt_depth / gt_nf

    def pointmap_term(rays, depth_n, trans_n, quats):
        pts = pointmap_from_rays_depth_pose(rays, depth_n, trans_n, quats)
        a, b = (
            (apply_log_to_norm(pts), apply_log_to_norm(gt_pts_n))
            if cfg.loss_in_log
            else (pts, gt_pts_n)
        )
        pix = crit(a, b)  # (B, V, H, W)
        return jnp.sum(masked_mean(pix, valid, axis=(0, 2, 3)))

    details: Dict[str, jnp.ndarray] = {}
    depth_term = pointmap_term(gt_rays, pr_depth / gt_nf, gt_trans_n, gt_quats)
    rays_term = pointmap_term(pr_rays, gt_depth_n, gt_trans_n, gt_quats)
    quats_term = pointmap_term(gt_rays, gt_depth_n, gt_trans_n, pr_quats)
    trans_term = pointmap_term(gt_rays, gt_depth_n, pr_trans / gt_nf_s[:, None, None], gt_quats)
    details["depth_loss"] = depth_term * cfg.depth_weight
    details["ray_dirs_loss"] = rays_term * cfg.ray_directions_weight
    details["pose_quats_loss"] = quats_term * cfg.pose_quats_weight
    details["pose_trans_loss"] = trans_term * cfg.pose_trans_weight
    total = (
        details["depth_loss"] + details["ray_dirs_loss"]
        + details["pose_quats_loss"] + details["pose_trans_loss"]
    )

    # Scale term (identical to the entangled loss's set 6).
    pr_pts = preds.pts3d / sc[:, None, None, None, None]
    metric_pr_pts = jax.lax.stop_gradient(pr_pts) * sc[:, None, None, None, None]
    _, pr_metric_nf = normalize_pointcloud(metric_pr_pts, valid, cfg.norm_mode, True)
    pr_metric_nf_s = pr_metric_nf.reshape(B)
    metric_sample = batch.is_metric_scale & (gt_nf_s > 1e-8)
    if cfg.loss_in_log:
        gt_sc, pr_sc = jnp.log1p(gt_nf_s)[:, None], jnp.log1p(pr_metric_nf_s)[:, None]
    else:
        gt_sc, pr_sc = gt_nf_s[:, None], pr_metric_nf_s[:, None]
    scale_loss = masked_mean(crit(pr_sc, gt_sc) * cfg.scale_weight, metric_sample)
    total = total + scale_loss
    details["scale_loss"] = scale_loss

    if preds.non_ambiguous_mask_logits is not None:
        bce = bce_with_logits(
            preds.non_ambiguous_mask_logits,
            batch.non_ambiguous_mask.astype(jnp.float32),
        )
        mask_loss = jnp.sum(
            masked_mean(bce, batch.valid_non_ambiguous_mask, axis=(0, 2, 3))
        )
        total = total + cfg.mask_loss_weight * mask_loss
        details["mask_loss"] = mask_loss

    details["total_loss"] = total
    return total, details


# --------------------------------------------------------------------------
# Simpler loss-zoo members (parity with the non-production criteria)
# --------------------------------------------------------------------------


def l1_distance(a, b):
    """L1Loss distance (losses.py:333): per-element abs summed over channels."""
    return jnp.sum(jnp.abs(a - b), axis=-1)


def l2_distance(a, b):
    """L2Loss distance (losses.py:340): euclidean norm over channels."""
    return safe_norm(a - b, axis=-1)


def dust3r_regr3d_conf_loss(
    gt_pts3d: jnp.ndarray,
    gt_valid: jnp.ndarray,
    gt_pose0: Tuple[jnp.ndarray, jnp.ndarray],
    pred_pts3d: jnp.ndarray,
    pred_conf: jnp.ndarray,
    conf_alpha: float = 0.2,
    norm_mode: str = "avg_dis",
    loss_in_log: bool = False,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """DUSt3R-style Regr3D + ConfLoss (losses.py:1475 + :919).

    Both GT and predictions are expressed in view 0's frame, normalized
    independently by avg_dis, compared with L2 distance, and confidence-
    weighted (loss * conf - alpha * log conf).

    Args:
        gt_pts3d: (B, V, H, W, 3) GT world points.
        gt_valid: (B, V, H, W) bool.
        gt_pose0: (quats (B, 4), trans (B, 3)) of GT view 0 (cam2world).
        pred_pts3d: (B, V, H, W, 3) predictions already in view-0 frame.
        pred_conf: (B, V, H, W) confidences (>= 1).
    """
    q0, t0 = gt_pose0
    inv_q0 = quat_inverse(q0)
    gt_v0 = quat_rotate(
        inv_q0[:, None, None, None, :], gt_pts3d - t0[:, None, None, None, :]
    )
    gt_n, _ = normalize_pointcloud(gt_v0, gt_valid, norm_mode, True)
    pr_n, _ = normalize_pointcloud(pred_pts3d, gt_valid, norm_mode, True)
    if loss_in_log:
        gt_n = apply_log_to_norm(gt_n)
        pr_n = apply_log_to_norm(pr_n)

    pix = l2_distance(pr_n, gt_n)  # (B, V, H, W)
    conf_weighted = pix * pred_conf - conf_alpha * jnp.log(pred_conf)
    per_view = masked_mean(conf_weighted, gt_valid, axis=(0, 2, 3))
    total = jnp.sum(per_view)
    return total, {"regr3d_conf_loss": total,
                   "regr3d_l2": masked_mean(pix, gt_valid)}


def rgb_perception_loss(
    vgg_params,
    pred_rgb: jnp.ndarray,
    gt_rgb: jnp.ndarray,
    valid: Optional[jnp.ndarray] = None,
    compute_dtype: str = "float32",
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """[FORK] VGG19 perceptual loss on predicted RGB (losses.py:467,849).

    Parity: ``RGBColorPerceptionLoss(PerceptualLoss())`` — per view, the
    prediction and GT (both RGB in [0, 1]) are preprocessed Caffe-style
    and compared at the pixel level plus five VGG19 (avg-pool) feature
    taps with the reference's fixed per-level weights; the per-sample
    distance is optionally scaled by the sample's valid-pixel fraction
    (PerceptualLoss mask semantics, losses.py:527-530), then averaged
    over samples and summed over views.

    Args:
        vgg_params: frozen ``VGG19Features`` params (converted ImageNet
            weights via ``convert_vgg19_features``, or any fixed net).
        pred_rgb / gt_rgb: (B, V, H, W, 3) in [0, 1].
        valid: optional (B, V, H, W) bool validity mask.
    """
    from mapanything_tpu.models.perceptual import (
        VGG19Features,
        perceptual_distance,
    )

    B, V = pred_rgb.shape[:2]
    net = VGG19Features(compute_dtype=compute_dtype)
    flat = lambda x: x.reshape((B * V,) + x.shape[2:])
    taps_pred = net.apply(vgg_params, flat(pred_rgb))
    taps_gt = net.apply(vgg_params, flat(gt_rgb))
    dist = perceptual_distance(taps_pred, taps_gt)  # (B*V,)
    if valid is not None:
        dist = dist * jnp.mean(
            flat(valid).astype(jnp.float32), axis=(-2, -1)
        )
    per_view = jnp.mean(dist.reshape(B, V), axis=0)  # mean over batch
    total = jnp.sum(per_view)  # sum over views (MultiLoss convention)
    return total, {"rgb_perception": total}
