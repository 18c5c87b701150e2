"""Offline pairwise covisibility computation for WAI scenes.

Parity: ``data_processing/wai_processing/scripts/covisibility.py:32-145``:
for every view, unproject its depth to world points, reproject into every
other view, and score covisibility as the fraction of points whose looked-
up depth matches the expected depth within an absolute + relative +
temperature threshold; the denominator is the target view's valid-depth
count (``valid_target_depth`` mode).

TPU-native: one jitted pairwise kernel computes a (chunk, V) block of the
covisibility matrix at a time — the per-view Python loop of the reference
becomes a batched reprojection einsum (same structure as
``geometry/frustum.py``).
"""

from __future__ import annotations

import math
from pathlib import Path
from typing import Optional

import numpy as np


def compute_pairwise_covisibility(
    depths: np.ndarray,
    intrinsics: np.ndarray,
    cam2worlds: np.ndarray,
    valid_masks: Optional[np.ndarray] = None,
    depth_assoc_error_thres: float = 0.1,
    depth_assoc_rel_error_thres: float = 0.02,
    depth_assoc_error_temp: float = 0.0,
    chunk_size: int = 8,
) -> np.ndarray:
    """Full (V, V) covisibility matrix for one scene.

    Args:
        depths: (V, H, W) z-depth per view (0 = invalid).
        intrinsics: (V, 3, 3); cam2worlds: (V, 4, 4).
        valid_masks: optional (V, H, W) bool; defaults to depth > 0.
    """
    import jax
    import jax.numpy as jnp

    from mapanything_tpu.geometry.camera import depthmap_to_camera_frame
    from mapanything_tpu.geometry.transforms import closed_form_pose_inverse

    V, H, W = depths.shape
    if valid_masks is None:
        valid_masks = depths > 0

    depths_j = jnp.asarray(depths, jnp.float32)
    K_j = jnp.asarray(intrinsics, jnp.float32)
    c2w_j = jnp.asarray(cam2worlds, jnp.float32)
    valid_j = jnp.asarray(valid_masks)

    w2c_j = closed_form_pose_inverse(c2w_j)
    valid_counts = jnp.maximum(jnp.sum(valid_j, axis=(1, 2)), 1)  # (V,)

    # Precompute world points per view.
    pts_cam, _ = depthmap_to_camera_frame(depths_j, K_j)  # (V, H, W, 3)
    rot = c2w_j[:, None, None, :3, :3]
    t = c2w_j[:, None, None, :3, 3]
    world_pts = jnp.einsum("vhwik,vhwk->vhwi", jnp.broadcast_to(rot, (V, H, W, 3, 3)), pts_cam) + t

    log_half_temp = -math.log(0.5) * depth_assoc_error_temp

    @jax.jit
    def block(src_world_pts, src_valid):
        """Covisibility of a chunk of source views vs ALL target views.

        src_world_pts: (C, H, W, 3); src_valid: (C, H, W).
        Returns (C, V) scores.
        """
        C = src_world_pts.shape[0]
        rot2 = w2c_j[None, :, None, None, :3, :3]  # (1, V, 1, 1, 3, 3)
        t2 = w2c_j[None, :, None, None, :3, 3]
        pw = src_world_pts[:, None]  # (C, 1, H, W, 3)
        cam = jnp.einsum("...ik,...k->...i", rot2, pw) + t2  # (C, V, H, W, 3)
        z = cam[..., 2]
        uvw = jnp.einsum("...ij,...j->...i", K_j[None, :, None, None], cam)
        safe_z = jnp.where(jnp.abs(z) < 1e-8, 1e-8, z)
        u = uvw[..., 0] / safe_z
        v = uvw[..., 1] / safe_z

        in_bounds = (u >= 0) & (u <= W - 1) & (v >= 0) & (v <= H - 1) & (z > 0)
        ui = jnp.clip(jnp.round(u).astype(jnp.int32), 0, W - 1)
        vi = jnp.clip(jnp.round(v).astype(jnp.int32), 0, H - 1)
        flat = vi * W + ui  # (C, V, H, W)

        d_flat = depths_j.reshape(V, H * W)
        m_flat = valid_j.reshape(V, H * W)
        # gather per target view: out[c, m, h, w] = d_flat[m, flat[c, m, h, w]]
        gather = jax.vmap(
            lambda s, i: s[i], in_axes=(0, 1), out_axes=1
        )  # over V with (HW,), (C, H, W)
        d_lu = gather(d_flat, flat)
        m_lu = gather(m_flat, flat)

        err = jnp.abs(z - d_lu)
        thres = (
            depth_assoc_error_thres
            + depth_assoc_rel_error_thres * z
            + log_half_temp
        )
        ok = (
            (err < thres) & in_bounds & m_lu.astype(bool)
            & src_valid[:, None, :, :]
        )
        score = jnp.sum(ok, axis=(2, 3)) / valid_counts[None, :]
        return jnp.clip(score, 0.0, 1.0)

    out = np.zeros((V, V), np.float32)
    for start in range(0, V, chunk_size):
        end = min(start + chunk_size, V)
        # Pad the final chunk to the static chunk size for one compile shape.
        pad = chunk_size - (end - start)
        src_pts = world_pts[start:end]
        src_val = valid_j[start:end]
        if pad:
            src_pts = jnp.concatenate([src_pts, jnp.zeros((pad, H, W, 3))], 0)
            src_val = jnp.concatenate([src_val, jnp.zeros((pad, H, W), bool)], 0)
        scores = np.asarray(block(src_pts, src_val))[: end - start]
        out[start:end] = scores
    np.fill_diagonal(out, np.clip(np.diagonal(out), 1e-3, None))
    return out


def write_covisibility(scene_root, covis: np.ndarray, version: str = "v0"):
    """Store the matrix in the WAI layout consumed by the datasets."""
    out_dir = Path(scene_root) / "covisibility" / version
    out_dir.mkdir(parents=True, exist_ok=True)
    np.save(out_dir / "pairwise_covisibility.npy", covis)
    return out_dir / "pairwise_covisibility.npy"
