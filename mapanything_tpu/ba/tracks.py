"""Correspondence tracks from feed-forward dense predictions.

The reference's BA stage extracts tracks with a learned VGGSfM tracker
(``mapanything/third_party/track_predict.py:23``, ALIKED/SuperPoint
keypoints + transformer refiner) before calling pycolmap's C++ BA
(``scripts/demo_colmap.py:466-485``). Here tracks come directly from the
model's own dense geometry — sample confident pixels, unproject with the
predicted depth, reproject into every other view with the predicted
poses/intrinsics, and keep observations where the projected depth agrees
with that view's predicted depth (the same consistency test as the
frustum mask, geometry/frustum.py). Fully vectorized jnp; static shapes
(fixed points-per-view, masked validity).
"""

from __future__ import annotations

from typing import Tuple

import flax.struct
import jax
import jax.numpy as jnp

from mapanything_tpu.geometry.transforms import closed_form_pose_inverse


@flax.struct.dataclass
class Tracks:
    """BA problem inputs, static shapes with validity masks.

    N = num points (tracks), M = num cameras.
    """

    points3d: jnp.ndarray  # (N, 3) initial world points
    observations_uv: jnp.ndarray  # (N, M, 2) pixel observations
    valid: jnp.ndarray  # (N, M) bool observation validity
    intrinsics: jnp.ndarray  # (M, 3, 3)
    cam_from_world_rot: jnp.ndarray  # (M, 3, 3) w2c rotations (initial)
    cam_from_world_trans: jnp.ndarray  # (M, 3) w2c translations (initial)


def extract_tracks_from_predictions(
    pts3d: jnp.ndarray,
    depth_z: jnp.ndarray,
    intrinsics: jnp.ndarray,
    camera_poses: jnp.ndarray,
    conf: jnp.ndarray,
    mask: jnp.ndarray,
    points_per_view: int = 512,
    depth_consistency_rtol: float = 0.05,
    rng_seed: int = 0,
) -> Tracks:
    """Build multi-view tracks from one scene's dense predictions.

    Args:
        pts3d: (V, H, W, 3) predicted world points.
        depth_z: (V, H, W) predicted z-depth per view.
        intrinsics: (V, 3, 3); camera_poses: (V, 4, 4) cam2world.
        conf: (V, H, W) confidence; mask: (V, H, W) validity.
        points_per_view: tracks seeded per view (static).

    Returns:
        Tracks with N = V * points_per_view.
    """
    V, H, W = depth_z.shape
    K = points_per_view

    # Seed selection: top-confidence valid pixels per view, jittered by a
    # random tiebreak so seeds spread spatially.
    key = jax.random.PRNGKey(rng_seed)
    noise = jax.random.uniform(key, (V, H, W)) * 1e-3
    score = jnp.where(mask, conf + noise, -jnp.inf)
    flat_score = score.reshape(V, H * W)
    top_idx = jnp.argsort(-flat_score, axis=1)[:, :K]  # (V, K)
    seed_valid = jnp.take_along_axis(
        mask.reshape(V, H * W), top_idx, axis=1
    )  # (V, K)

    # Seed 3D points from the predicted pointmaps.
    pts_flat = pts3d.reshape(V, H * W, 3)
    seeds3d = jnp.take_along_axis(pts_flat, top_idx[..., None], axis=1)  # (V, K, 3)
    points3d = seeds3d.reshape(V * K, 3)

    # Project every point into every camera.
    w2c = closed_form_pose_inverse(camera_poses)  # (V, 4, 4)
    rot = w2c[:, :3, :3]  # (M, 3, 3)
    trans = w2c[:, :3, 3]  # (M, 3)
    cam_pts = (
        jnp.einsum("mij,nj->nmi", rot, points3d) + trans[None]
    )  # (N, M, 3)
    z = cam_pts[..., 2]
    uvw = jnp.einsum("mij,nmj->nmi", intrinsics, cam_pts)
    safe_z = jnp.where(jnp.abs(z) < 1e-8, 1e-8, z)
    uv = uvw[..., :2] / safe_z[..., None]  # (N, M, 2)

    in_bounds = (
        (uv[..., 0] >= 0) & (uv[..., 0] <= W - 1)
        & (uv[..., 1] >= 0) & (uv[..., 1] <= H - 1) & (z > 0)
    )

    # Depth consistency against each view's predicted z-depth (nearest px).
    ui = jnp.clip(jnp.round(uv[..., 0]).astype(jnp.int32), 0, W - 1)
    vi = jnp.clip(jnp.round(uv[..., 1]).astype(jnp.int32), 0, H - 1)
    flat = vi * W + ui  # (N, M)
    depth_flat = depth_z.reshape(V, H * W)
    mask_flat = mask.reshape(V, H * W)
    # gather per camera m: depth_flat[m, flat[:, m]]
    gathered_d = _gather_per_cam(depth_flat, flat)
    gathered_m = _gather_per_cam(mask_flat, flat)
    depth_ok = (
        jnp.abs(gathered_d - z) / jnp.maximum(jnp.abs(gathered_d), 1e-6)
        < depth_consistency_rtol
    )

    valid = in_bounds & depth_ok & gathered_m.astype(bool)
    valid = valid & seed_valid.reshape(V * K)[:, None]
    # Keep only tracks observed in >= 2 views.
    valid = valid & (jnp.sum(valid, axis=1, keepdims=True) >= 2)

    return Tracks(
        points3d=points3d,
        observations_uv=uv,
        valid=valid,
        intrinsics=intrinsics,
        cam_from_world_rot=rot,
        cam_from_world_trans=trans,
    )


def _gather_per_cam(src: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """src (M, HW), idx (N, M) -> out (N, M) with out[n, m] = src[m, idx[n, m]]."""
    return jax.vmap(lambda s, i: s[i], in_axes=(0, 1), out_axes=1)(src, idx)


def tracks_from_photometric_tracker(
    images: jnp.ndarray,
    depth_z: jnp.ndarray,
    intrinsics: jnp.ndarray,
    camera_poses: jnp.ndarray,
    max_query_pts: int = 512,
    query_frame_num: int = 3,
    vis_thresh: float = 0.6,
    tracker_params=None,
) -> Tracks:
    """Build BA tracks from the photometric keypoint tracker.

    Parity: the reference's learned-tracker BA path
    (``track_predict.predict_tracks`` -> ``np_to_pycolmap`` ->
    ``pycolmap.bundle_adjustment``, demo_colmap.py:443-485). Observations
    come from :mod:`mapanything_tpu.ba.tracker` (corner detection +
    coarse-to-fine NCC); each track's 3D point initializes from the query
    view's predicted depth unprojected with the predicted camera.

    Args:
        images: (V, H, W, 3) in [0, 1].
        depth_z: (V, H, W); intrinsics (V, 3, 3); camera_poses (V, 4, 4)
            cam2world.
    """
    import numpy as np

    from mapanything_tpu.ba.tracker import predict_tracks, select_query_frames

    tracks_uv, vis, scores = predict_tracks(
        images,
        max_query_pts=max_query_pts,
        query_frame_num=query_frame_num,
        vis_thresh=vis_thresh,
        tracker_params=tracker_params,  # learned VGGSfM route when set
    )  # (V, N, 2), (V, N), (V, N)
    return _assemble_tracks_from_uv(
        tracks_uv, vis, scores, depth_z, intrinsics, camera_poses
    )


def _assemble_tracks_from_uv(
    tracks_uv, vis, scores, depth_z, intrinsics, camera_poses
) -> Tracks:
    """(V, N, 2)/(V, N) tracker outputs -> Tracks; each track's 3D point
    initializes from its query frame (score == 1 by construction)."""
    import numpy as np

    V, H, W = np.asarray(depth_z).shape
    tracks_uv = np.asarray(tracks_uv)
    N = tracks_uv.shape[1]
    q_frame = np.argmax(np.asarray(scores), axis=0)  # (N,)
    dz = np.asarray(depth_z)
    Kn = np.asarray(intrinsics)
    P = np.asarray(camera_poses)
    pts3d = np.zeros((N, 3), np.float32)
    for n in range(N):
        q = int(q_frame[n])
        u, v = tracks_uv[q, n]
        ui, vi = int(round(float(u))), int(round(float(v)))
        ui = min(max(ui, 0), W - 1)
        vi = min(max(vi, 0), H - 1)
        z = float(dz[q, vi, ui])
        x = (float(u) - Kn[q, 0, 2]) * z / Kn[q, 0, 0]
        y = (float(v) - Kn[q, 1, 2]) * z / Kn[q, 1, 1]
        pts3d[n] = P[q, :3, :3] @ np.array([x, y, z], np.float32) + P[q, :3, 3]

    w2c = np.asarray(closed_form_pose_inverse(jnp.asarray(P)))
    return Tracks(
        points3d=jnp.asarray(pts3d),
        observations_uv=jnp.asarray(np.swapaxes(tracks_uv, 0, 1)),
        valid=jnp.asarray(np.swapaxes(np.asarray(vis), 0, 1)),
        intrinsics=jnp.asarray(Kn),
        cam_from_world_rot=jnp.asarray(w2c[:, :3, :3]),
        cam_from_world_trans=jnp.asarray(w2c[:, :3, 3]),
    )


def tracks_from_descriptor_matcher(
    images: jnp.ndarray,
    pair_desc_fn,
    intrinsics: jnp.ndarray,
    camera_poses: jnp.ndarray,
    depth_z: jnp.ndarray,
    query_frame_num: int = 3,
    subsample: int = 8,
    sim_thresh: float = 0.2,
) -> Tracks:
    """Tracks from learned-descriptor matching (MASt3R local features),
    triangulation-free: 3D seeds unproject the query pixels with the
    predicted depth (same scheme as tracks_from_photometric_tracker).

    This replaces Harris+NCC with the already-native descriptor head —
    VERDICT r1 item 7; reference analogue: VGGSfM tracks feeding
    pycolmap.bundle_adjustment (scripts/demo_colmap.py:466-485).
    """
    from mapanything_tpu.ba.tracker import predict_tracks_descriptors

    tracks, vis, scores = predict_tracks_descriptors(
        images, pair_desc_fn, query_frame_num=query_frame_num,
        subsample=subsample, sim_thresh=sim_thresh,
    )
    return _assemble_tracks_from_uv(
        tracks, vis, scores, depth_z, intrinsics, camera_poses
    )
