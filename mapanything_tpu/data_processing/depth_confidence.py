"""Per-pixel cross-view depth-consistency confidence for WAI scenes.

Parity: ``data_processing/wai_processing/scripts/depth_consistency_confidence.py``
(:36-157): for every frame, unproject its depth map to world points,
reproject into every other frame, look up the target depth there, and
classify each source pixel's reprojection as an inlier
(|expected - looked-up| < abs + rel * expected) or outlier (> threshold)
per target view. The confidence map is inliers / (inliers + outliers + eps)
in [0, 1], stored as a ``depth_confidence`` modality next to the
covisibility data.

TPU-native: the whole (V, H, W) confidence stack is one jitted program —
the reference's per-frame Python loop with torch chunking becomes a
``lax.map`` over source-view chunks of a batched reprojection einsum
(the same structure as ``data_processing/covisibility.py``, which shares
its thresholds). The reference's optional frustum pre-check
(perform_frustum_check) only prunes work on sparse scenes; the vectorized
all-pairs program makes it unnecessary — views without overlap contribute
neither inliers nor outliers.
"""

from __future__ import annotations

from functools import partial
from pathlib import Path
from typing import Dict, List, Optional, Sequence

import numpy as np


def _conf_maps_jax(
    depths,
    intrinsics,
    cam2worlds,
    valid_masks,
    abs_thres: float,
    rel_thres: float,
    chunk_size: int,
):
    """Jit-traced body: (Vp, H, W) inputs (padded to a chunk multiple)."""
    import jax
    import jax.numpy as jnp

    from mapanything_tpu.geometry.camera import depthmap_to_camera_frame
    from mapanything_tpu.geometry.transforms import closed_form_pose_inverse

    Vp, H, W = depths.shape

    w2c = closed_form_pose_inverse(cam2worlds)

    pts_cam, _ = depthmap_to_camera_frame(depths, intrinsics)  # (Vp, H, W, 3)
    rot = cam2worlds[:, None, None, :3, :3]
    t = cam2worlds[:, None, None, :3, 3]
    world_pts = (
        jnp.einsum(
            "vhwik,vhwk->vhwi",
            jnp.broadcast_to(rot, (Vp, H, W, 3, 3)),
            pts_cam,
        )
        + t
    )

    d_flat = depths.reshape(Vp, H * W)
    m_flat = valid_masks.reshape(Vp, H * W)
    # A view never scores against itself (the reference iterates over
    # OTHER overlapping views; self-projection is a trivial inlier).
    view_ids = jnp.arange(Vp)

    def block(chunk):
        """Per-pixel inlier/outlier counts for a chunk of source views."""
        src_world_pts, src_valid, src_ids = chunk  # (C, H, W, 3), (C, H, W), (C,)
        rot2 = w2c[None, :, None, None, :3, :3]  # (1, Vp, 1, 1, 3, 3)
        t2 = w2c[None, :, None, None, :3, 3]
        pw = src_world_pts[:, None]  # (C, 1, H, W, 3)
        cam = jnp.einsum("...ik,...k->...i", rot2, pw) + t2  # (C, Vp, H, W, 3)
        z = cam[..., 2]
        uvw = jnp.einsum(
            "...ij,...j->...i", intrinsics[None, :, None, None], cam
        )
        safe_z = jnp.where(jnp.abs(z) < 1e-8, 1e-8, z)
        u = uvw[..., 0] / safe_z
        v = uvw[..., 1] / safe_z

        in_bounds = (u >= 0) & (u <= W - 1) & (v >= 0) & (v <= H - 1) & (z > 0)
        ui = jnp.clip(jnp.round(u).astype(jnp.int32), 0, W - 1)
        vi = jnp.clip(jnp.round(v).astype(jnp.int32), 0, H - 1)
        flat = vi * W + ui  # (C, Vp, H, W)

        gather = jax.vmap(lambda s, i: s[i], in_axes=(0, 1), out_axes=1)
        d_lu = gather(d_flat, flat)
        m_lu = gather(m_flat, flat)

        err = jnp.abs(z - d_lu)
        thres = abs_thres + rel_thres * z
        valid = (
            in_bounds
            & m_lu.astype(bool)
            & src_valid[:, None, :, :]
            & (src_ids[:, None, None, None] != view_ids[None, :, None, None])
        )
        inl = jnp.sum((err < thres) & valid, axis=1).astype(jnp.float32)
        outl = jnp.sum((err > thres) & valid, axis=1).astype(jnp.float32)
        return inl / (inl + outl + 1e-10)  # (C, H, W)

    n_chunks = Vp // chunk_size
    pts_chunks = world_pts.reshape(n_chunks, chunk_size, H, W, 3)
    val_chunks = valid_masks.reshape(n_chunks, chunk_size, H, W)
    id_chunks = view_ids.reshape(n_chunks, chunk_size)
    conf = jax.lax.map(block, (pts_chunks, val_chunks, id_chunks))
    return conf.reshape(Vp, H, W)


def compute_depth_consistency_confidence(
    depths: np.ndarray,
    intrinsics: np.ndarray,
    cam2worlds: np.ndarray,
    valid_masks: Optional[np.ndarray] = None,
    depth_assoc_error_thres: float = 0.1,
    depth_assoc_rel_error_thres: float = 0.005,
    chunk_size: int = 4,
) -> np.ndarray:
    """Per-pixel depth-consistency confidence maps for one scene.

    Args:
        depths: (V, H, W) z-depth per view (0 = invalid).
        intrinsics: (V, 3, 3); cam2worlds: (V, 4, 4) OpenCV cam2world.
        valid_masks: optional (V, H, W) bool; defaults to depth > 0.
        depth_assoc_*: inlier threshold abs + rel * expected_depth
            (reference covisibility_gt_depth.yaml:17-19 defaults).

    Returns:
        (V, H, W) float32 confidence in [0, 1]; 0 where a pixel was never
        validly observed by another view.
    """
    import jax

    V, H, W = depths.shape
    if valid_masks is None:
        valid_masks = depths > 0

    chunk_size = min(chunk_size, V)
    pad = (-V) % chunk_size
    Vp = V + pad

    def pad_v(x, fill=None):
        if pad == 0:
            return np.ascontiguousarray(x)
        out = np.concatenate(
            [x, np.zeros((pad,) + x.shape[1:], x.dtype)], axis=0
        )
        return out

    depths_p = pad_v(depths.astype(np.float32))
    K_p = pad_v(intrinsics.astype(np.float32))
    c2w_p = pad_v(cam2worlds.astype(np.float32))
    if pad:
        c2w_p[V:] = np.eye(4, dtype=np.float32)
        K_p[V:] = np.eye(3, dtype=np.float32)
    valid_p = pad_v(valid_masks.astype(bool))

    fn = jax.jit(
        partial(
            _conf_maps_jax,
            abs_thres=float(depth_assoc_error_thres),
            rel_thres=float(depth_assoc_rel_error_thres),
            chunk_size=chunk_size,
        )
    )
    return np.asarray(fn(depths_p, K_p, c2w_p, valid_p))[:V]


def write_depth_confidence(
    scene_root,
    frame_names: Sequence[str],
    confidence: np.ndarray,
    method_name: str = "gt_depth",
    version: str = "v0",
) -> List[Path]:
    """Store per-frame confidence EXRs + register the WAI modality.

    Mirrors the reference's output layout
    (``depth_consistency_confidence.py:180-252``):
    ``covisibility/<version>/depth_confidence/<frame>.exr`` plus a
    ``depth_confidence`` entry in scene_meta's frame_modalities and a
    ``<method>_depth_confidence`` key on each frame.
    """
    import json

    from mapanything_tpu.utils.exr import write_depth_exr

    scene_root = Path(scene_root)
    out_dir = scene_root / "covisibility" / version / "depth_confidence"
    out_dir.mkdir(parents=True, exist_ok=True)

    meta_path = scene_root / "scene_meta.json"
    meta: Dict = json.loads(meta_path.read_text()) if meta_path.exists() else {}
    by_name = {
        fr.get("frame_name"): fr for fr in meta.get("frames", [])
    }

    paths = []
    key = f"{method_name}_depth_confidence"
    for name, conf in zip(frame_names, confidence):
        p = out_dir / f"{name}.exr"
        write_depth_exr(p, np.asarray(conf, np.float32))
        paths.append(p)
        if name in by_name:
            by_name[name][key] = str(p.relative_to(scene_root))

    if meta:
        fm = meta.setdefault("frame_modalities", {})
        dc = fm.setdefault("depth_confidence", {})
        dc[method_name] = {"frame_key": key, "format": "scalar"}
        meta_path.write_text(json.dumps(meta, indent=2))
    return paths
