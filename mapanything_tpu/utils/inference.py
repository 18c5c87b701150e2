"""User-facing inference pipeline: validate -> preprocess -> forward -> postprocess.

Capability parity with ``mapanything/utils/inference.py``:
  - ``validate_input_views`` (:130): modality-conflict checks (intrinsics vs
    ray dirs, depth requires calibration, poses require world frame...);
  - ``preprocess_inputs_for_inference`` (:222): image normalization,
    K -> unit-sphere rays, z-depth -> depth-along-ray, 4x4 poses ->
    (quats, trans), default metric flags;
  - ``postprocess_model_outputs_for_inference`` (:314): denormalized
    images, z-depth, intrinsics recovery, 4x4 poses, and the combined
    non-ambiguous / confidence-percentile / depth+normal-edge mask.

TPU-first: the whole postprocess (including per-image confidence quantiles
and the edge masks) is pure jnp and jit-compatible — the reference drops to
CPU numpy per batch element (inference.py:419-483); here it fuses into the
same XLA program as the forward pass.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import flax.struct
import jax.numpy as jnp

from mapanything_tpu.geometry.camera import (
    convert_z_depth_to_depth_along_ray,
    rays_in_camera_frame,
    recover_pinhole_intrinsics_from_ray_directions,
)
from mapanything_tpu.geometry.normals import depth_edge, normals_edge, points_to_normals
from mapanything_tpu.geometry.quaternion import (
    pose_matrix_to_quats_trans,
    quats_trans_to_pose_matrix,
)
from mapanything_tpu.models.encoders.normalizations import IMAGE_NORMALIZATION_DICT
from mapanything_tpu.models.mapanything import Predictions, Views


@dataclass(frozen=True)
class PostprocessConfig:
    """Masking options (reference inference.py:314 defaults)."""

    apply_mask: bool = True
    mask_edges: bool = True
    edge_normal_threshold: float = 5.0
    edge_depth_threshold: float = 0.03
    apply_confidence_mask: bool = False
    confidence_percentile: float = 10.0


@flax.struct.dataclass
class InferenceOutputs:
    """Postprocessed predictions, all (B, V, ...)."""

    pts3d: jnp.ndarray
    pts3d_cam: jnp.ndarray
    ray_directions: jnp.ndarray
    depth_along_ray: jnp.ndarray
    depth_z: jnp.ndarray  # (B, V, H, W, 1)
    intrinsics: jnp.ndarray  # (B, V, 3, 3) recovered
    camera_poses: jnp.ndarray  # (B, V, 4, 4) cam2world, view-0 frame
    cam_trans: jnp.ndarray
    cam_quats: jnp.ndarray
    metric_scaling_factor: jnp.ndarray
    img_no_norm: jnp.ndarray  # (B, V, H, W, 3) in [0, 1]
    conf: Optional[jnp.ndarray] = None
    mask: Optional[jnp.ndarray] = None  # (B, V, H, W, 1) final combined mask
    non_ambiguous_mask: Optional[jnp.ndarray] = None


def preprocess_inputs_for_inference(
    images: jnp.ndarray,
    intrinsics: Optional[jnp.ndarray] = None,
    depth_z: Optional[jnp.ndarray] = None,
    depth_along_ray: Optional[jnp.ndarray] = None,
    ray_directions: Optional[jnp.ndarray] = None,
    camera_poses: Optional[jnp.ndarray] = None,
    camera_pose_quats: Optional[jnp.ndarray] = None,
    camera_pose_trans: Optional[jnp.ndarray] = None,
    is_metric_scale: Optional[jnp.ndarray] = None,
    data_norm_type: str = "dinov2",
) -> Views:
    """Build model ``Views`` from user inputs (reference inference.py:130-311).

    Args:
        images: (B, V, H, W, 3) RGB in [0, 1].
        intrinsics: optional (B, V, 3, 3) pinhole K (OpenCV convention).
        depth_z: optional (B, V, H, W) or (B, V, H, W, 1) z-depth.
        depth_along_ray: optional precomputed (B, V, H, W, 1).
        ray_directions: optional (B, V, H, W, 3); conflicts with intrinsics.
        camera_poses: optional (B, V, 4, 4) OpenCV cam2world; world frame
            must be view 0 or any consistent frame (model re-canonicalizes).
        is_metric_scale: optional (B, V) bool; defaults to all-True when any
            geometric input is given (reference: metric by default).
    """
    B, V, H, W, _ = images.shape

    # Validation (reference validate_input_views_for_inference, :130).
    if intrinsics is not None and ray_directions is not None:
        raise ValueError("provide either intrinsics or ray_directions, not both")
    if depth_z is not None and intrinsics is None:
        raise ValueError("depth_z input requires intrinsics (calibration)")
    if depth_along_ray is not None and (
        intrinsics is None and ray_directions is None
    ):
        raise ValueError("depth_along_ray requires intrinsics or ray_directions")
    if camera_pose_quats is not None and camera_poses is not None:
        raise ValueError("provide either camera_poses or quats/trans, not both")
    if depth_z is not None and depth_along_ray is not None:
        raise ValueError("provide either depth_z or depth_along_ray, not both")

    norm = IMAGE_NORMALIZATION_DICT[data_norm_type]
    mean = jnp.asarray(norm.mean)
    std = jnp.asarray(norm.std)
    img = (images - mean) / std

    rays = ray_directions
    if intrinsics is not None and rays is None:
        _, rays = rays_in_camera_frame(intrinsics, H, W, normalize_to_unit_sphere=True)

    d_along = depth_along_ray
    if depth_z is not None:
        if depth_z.ndim == 5:
            depth_z = depth_z[..., 0]
        d_along = convert_z_depth_to_depth_along_ray(depth_z, intrinsics)[..., None]

    quats, trans = camera_pose_quats, camera_pose_trans
    if camera_poses is not None:
        quats, trans = pose_matrix_to_quats_trans(camera_poses)

    if is_metric_scale is None:
        is_metric_scale = jnp.ones((B, V), bool)

    return Views(
        img=img,
        ray_directions=rays,
        depth_along_ray=d_along,
        camera_pose_quats=quats,
        camera_pose_trans=trans,
        is_metric_scale=is_metric_scale,
    )


def _per_image_quantile(x: jnp.ndarray, q: float) -> jnp.ndarray:
    """Per-(B, V) quantile over the pixel dims of (B, V, H, W)."""
    b, v, h, w = x.shape
    flat = x.reshape(b, v, h * w)
    return jnp.quantile(flat, q, axis=-1)[..., None, None]


def postprocess_model_outputs_for_inference(
    preds: Predictions,
    views: Views,
    cfg: PostprocessConfig = PostprocessConfig(),
    data_norm_type: str = "dinov2",
) -> InferenceOutputs:
    """Derive user-facing outputs + combined validity mask (reference :314)."""
    norm = IMAGE_NORMALIZATION_DICT[data_norm_type]
    img_no_norm = views.img * jnp.asarray(norm.std) + jnp.asarray(norm.mean)
    if preds.rgb is not None:
        img_no_norm = preds.rgb

    depth_z = preds.pts3d_cam[..., 2:3]
    intrinsics = recover_pinhole_intrinsics_from_ray_directions(preds.ray_directions)
    camera_poses = quats_trans_to_pose_matrix(preds.cam_quats, preds.cam_trans)

    final_mask = None
    if cfg.apply_mask and preds.non_ambiguous_mask is not None:
        final_mask = preds.non_ambiguous_mask  # (B, V, H, W)

    if cfg.apply_confidence_mask and preds.conf is not None:
        thresh = _per_image_quantile(preds.conf, cfg.confidence_percentile / 100.0)
        conf_mask = preds.conf > thresh
        final_mask = conf_mask if final_mask is None else (final_mask & conf_mask)

    if cfg.apply_mask and cfg.mask_edges and final_mask is not None:
        normals, normals_mask = points_to_normals(preds.pts3d, final_mask)
        n_edge = normals_edge(normals, cfg.edge_normal_threshold, mask=normals_mask)
        d_edge = depth_edge(depth_z[..., 0], rtol=cfg.edge_depth_threshold, mask=final_mask)
        final_mask = final_mask & ~(d_edge & n_edge)

    pts3d = preds.pts3d
    pts3d_cam = preds.pts3d_cam
    depth_along_ray = preds.depth_along_ray
    mask_out = None
    if final_mask is not None:
        m = final_mask[..., None]
        pts3d = pts3d * m
        pts3d_cam = pts3d_cam * m
        depth_along_ray = depth_along_ray * m
        depth_z = depth_z * m
        mask_out = m

    return InferenceOutputs(
        pts3d=pts3d,
        pts3d_cam=pts3d_cam,
        ray_directions=preds.ray_directions,
        depth_along_ray=depth_along_ray,
        depth_z=depth_z,
        intrinsics=intrinsics,
        camera_poses=camera_poses,
        cam_trans=preds.cam_trans,
        cam_quats=preds.cam_quats,
        metric_scaling_factor=preds.metric_scaling_factor,
        img_no_norm=img_no_norm,
        conf=preds.conf,
        mask=mask_out,
        non_ambiguous_mask=preds.non_ambiguous_mask,
    )


def infer(
    model,
    params,
    images: jnp.ndarray,
    postprocess_cfg: PostprocessConfig = PostprocessConfig(),
    data_norm_type: str = "dinov2",
    **modalities,
) -> InferenceOutputs:
    """One-call inference API (reference MapAnything.infer, model.py:2207).

    ``modalities`` forwards to ``preprocess_inputs_for_inference``
    (intrinsics / depth_z / camera_poses / ...). The caller decides jit
    placement; the whole pipeline is jit-compatible.
    """
    views = preprocess_inputs_for_inference(
        images, data_norm_type=data_norm_type, **modalities
    )
    preds = model.apply(params, views)
    return postprocess_model_outputs_for_inference(
        preds, views, postprocess_cfg, data_norm_type
    )
