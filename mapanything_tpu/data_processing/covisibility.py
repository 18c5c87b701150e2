"""Offline pairwise covisibility computation for WAI scenes.

Parity: ``data_processing/wai_processing/scripts/covisibility.py:32-145``:
for every view, unproject its depth to world points, reproject into every
other view, and score covisibility as the fraction of points whose looked-
up depth matches the expected depth within an absolute + relative +
temperature threshold; the denominator is the target view's valid-depth
count (``valid_target_depth`` mode).

TPU-native: the ENTIRE (V, V) matrix is one jitted program — unprojection,
reprojection einsums and a ``lax.map`` over source-view chunks — so a
scene costs a single dispatch (eager op-by-op dispatch is pathologically
slow over remote-compile TPU transports). The per-view Python loop of the
reference becomes a batched reprojection einsum (same structure as
``geometry/frustum.py``).
"""

from __future__ import annotations

import math
from functools import partial
from pathlib import Path
from typing import Optional

import numpy as np


def _covis_matrix_jax(
    depths,
    intrinsics,
    cam2worlds,
    valid_masks,
    abs_thres: float,
    rel_thres: float,
    log_half_temp: float,
    chunk_size: int,
):
    """Jit-traced body: (Vp, H, W) inputs (padded to chunk multiple)."""
    import jax
    import jax.numpy as jnp

    from mapanything_tpu.geometry.camera import depthmap_to_camera_frame
    from mapanything_tpu.geometry.transforms import closed_form_pose_inverse

    Vp, H, W = depths.shape

    w2c = closed_form_pose_inverse(cam2worlds)
    valid_counts = jnp.maximum(jnp.sum(valid_masks, axis=(1, 2)), 1)  # (Vp,)

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

    def block(chunk):
        """Covisibility of a chunk of source views vs ALL target views."""
        src_world_pts, src_valid = chunk  # (C, H, W, 3), (C, H, W)
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

        # gather per target view: out[c, m, h, w] = d_flat[m, flat[c, m, h, w]]
        gather = jax.vmap(lambda s, i: s[i], in_axes=(0, 1), out_axes=1)
        d_lu = gather(d_flat, flat)
        m_lu = gather(m_flat, flat)

        err = jnp.abs(z - d_lu)
        thres = abs_thres + rel_thres * z + log_half_temp
        ok = (
            (err < thres) & in_bounds & m_lu.astype(bool)
            & src_valid[:, None, :, :]
        )
        score = jnp.sum(ok, axis=(2, 3)) / valid_counts[None, :]
        return jnp.clip(score, 0.0, 1.0)

    n_chunks = Vp // chunk_size
    pts_chunks = world_pts.reshape(n_chunks, chunk_size, H, W, 3)
    val_chunks = valid_masks.reshape(n_chunks, chunk_size, H, W)
    scores = jax.lax.map(block, (pts_chunks, val_chunks))  # (n, C, Vp)
    return scores.reshape(Vp, Vp)


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

    V, H, W = depths.shape
    if valid_masks is None:
        valid_masks = depths > 0

    chunk_size = min(chunk_size, V)
    # Pad V to a chunk multiple on the host so the device program is static.
    pad = (-V) % chunk_size
    Vp = V + pad

    def pad_v(x):
        if pad == 0:
            return x
        return np.concatenate(
            [x, np.zeros((pad,) + x.shape[1:], x.dtype)], axis=0
        )

    depths_p = pad_v(np.ascontiguousarray(depths, np.float32))
    K_p = pad_v(np.ascontiguousarray(intrinsics, np.float32))
    # Padded poses must stay invertible: use identity.
    c2w_p = pad_v(np.ascontiguousarray(cam2worlds, np.float32))
    if pad:
        c2w_p[V:] = np.eye(4, dtype=np.float32)
        K_p[V:] = np.eye(3, dtype=np.float32)
    valid_p = pad_v(np.ascontiguousarray(valid_masks, bool))

    fn = jax.jit(
        partial(
            _covis_matrix_jax,
            abs_thres=float(depth_assoc_error_thres),
            rel_thres=float(depth_assoc_rel_error_thres),
            log_half_temp=-math.log(0.5) * float(depth_assoc_error_temp),
            chunk_size=chunk_size,
        )
    )
    out = np.asarray(fn(depths_p, K_p, c2w_p, valid_p))[:V, :V]
    out = out.copy()
    np.fill_diagonal(out, np.clip(np.diagonal(out), 1e-3, None))
    return out


def write_covisibility(scene_root, covis: np.ndarray, version: str = "v0"):
    """Store the matrix in the WAI layout consumed by the datasets."""
    out_dir = Path(scene_root) / "covisibility" / version
    out_dir.mkdir(parents=True, exist_ok=True)
    np.save(out_dir / "pairwise_covisibility.npy", covis)
    return out_dir / "pairwise_covisibility.npy"
