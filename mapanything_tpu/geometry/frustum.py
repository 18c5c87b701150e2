"""Cross-view frustum-consistency masks, fully vectorized.

Parity: ``calculate_in_frustum_mask`` (reference
``mapanything/utils/geometry.py:2261`` and the fork's training-time
non-ambiguous-mask computation at ``model.py:770-790``).

The reference loops in Python over (batch, v1, v2) with grid_sample; here a
single einsum projects every view-1 point into every view-2 camera, and
nearest-neighbor depth lookup is a static gather — no data-dependent control
flow, so the whole mask computation jits into one fused XLA program.
"""

from __future__ import annotations

import jax.numpy as jnp

from mapanything_tpu.geometry.camera import depthmap_to_camera_frame
from mapanything_tpu.geometry.transforms import closed_form_pose_inverse


def calculate_in_frustum_mask(
    depth_1: jnp.ndarray,
    intrinsics_1: jnp.ndarray,
    c2w_1: jnp.ndarray,
    mask_1: jnp.ndarray,
    depth_2: jnp.ndarray,
    intrinsics_2: jnp.ndarray,
    c2w_2: jnp.ndarray,
    mask_2: jnp.ndarray,
    atol: float = 1e-1,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Which pixels of view-set 1 are observed consistently by view-set 2.

    Args:
        depth_1: (B, V1, H, W) z-depth; intrinsics_1 (B, V1, 3, 3);
        c2w_1: (B, V1, 4, 4); mask_1 (B, V1, H, W) prior visibility mask.
        depth_2 / intrinsics_2 / c2w_2 / mask_2: same for the target set (V2).
        atol: absolute depth-match tolerance.

    Returns:
        (mask, valid_mask) both (B, V1, H, W):
        mask      — pixel is re-observed (non-ambiguous) or already in mask_1.
        valid_mask — the mask value at this pixel is trustworthy.
    """
    b, v1, h, w = depth_1.shape
    v2 = depth_2.shape[1]

    # World-frame points of view-set 1: (B, V1, H, W, 3)
    pts_cam, _ = depthmap_to_camera_frame(depth_1, intrinsics_1)
    rot1 = c2w_1[..., None, None, :3, :3]
    t1 = c2w_1[..., None, None, :3, 3]
    pts_world = jnp.einsum("bvhwik,bvhwk->bvhwi", jnp.broadcast_to(rot1, (b, v1, h, w, 3, 3)), pts_cam) + t1

    # Transform into every view-2 camera: (B, V1, V2, H, W, 3)
    w2c_2 = closed_form_pose_inverse(c2w_2)  # (B, V2, 4, 4)
    rot2 = w2c_2[:, None, :, None, None, :3, :3]
    t2 = w2c_2[:, None, :, None, None, :3, 3]
    pw = pts_world[:, :, None]  # (B, V1, 1, H, W, 3)
    cam_pts = jnp.einsum("...ik,...k->...i", rot2, pw) + t2  # (B, V1, V2, H, W, 3)

    # Project with view-2 intrinsics.
    K2 = intrinsics_2[:, None, :, None, None]  # (B, 1, V2, 1, 1, 3, 3)
    z = cam_pts[..., 2]
    uvw = jnp.einsum("...ij,...j->...i", K2, cam_pts)
    safe_z = jnp.where(jnp.abs(z) < 1e-8, 1e-8, z)
    u = uvw[..., 0] / safe_z
    v = uvw[..., 1] / safe_z

    in_frustum = (u > 0) & (u < w) & (v > 0) & (v < h) & (z > 0)
    in_frustum_any = jnp.any(in_frustum, axis=2)  # (B, V1, H, W)

    non_zero_depth = depth_1 > 1e-6

    # Nearest-neighbor lookup of view-2 depth/mask at the projected pixel.
    # grid_sample(mode="nearest", align_corners=False) on coords normalized as
    # (u/w)*2-1 samples the texel floor(u + eps) — i.e. round-to-nearest of
    # the half-pixel-centered grid; plain floor matches it for in-bounds u.
    ui = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, w - 1)
    vi = jnp.clip(jnp.floor(v).astype(jnp.int32), 0, h - 1)

    # Gather per (B, V2): build flat indices into depth_2 (B, V2, H, W).
    flat_idx = vi * w + ui  # (B, V1, V2, H, W)
    depth_2_flat = depth_2.reshape(b, v2, h * w)
    mask_2_flat = mask_2.reshape(b, v2, h * w)
    # take_along_axis over the flattened pixel dim, batched over (B, V2).
    gathered_depth = _gather_bv(depth_2_flat, flat_idx)
    gathered_mask = _gather_bv(mask_2_flat, flat_idx)

    matching = jnp.isclose(z, gathered_depth, atol=atol) & gathered_mask & in_frustum
    valid_match = gathered_mask & in_frustum

    matching_any = jnp.any(matching, axis=2)
    valid_match_any = jnp.any(valid_match, axis=2)

    mask = (non_zero_depth & in_frustum_any & matching_any) | mask_1
    valid_mask = (non_zero_depth & ~(in_frustum_any & ~valid_match_any)) | mask_1
    return mask, valid_mask


def _gather_bv(src_flat: jnp.ndarray, flat_idx: jnp.ndarray) -> jnp.ndarray:
    """Gather ``src_flat (B, V2, HW)`` at ``flat_idx (B, V1, V2, H, W)``.

    Returns (B, V1, V2, H, W).
    """
    b, v1, v2, h, w = flat_idx.shape
    idx = flat_idx.transpose(0, 2, 1, 3, 4).reshape(b, v2, v1 * h * w)
    out = jnp.take_along_axis(src_flat, idx, axis=-1)  # (B, V2, V1*H*W)
    return out.reshape(b, v2, v1, h, w).transpose(0, 2, 1, 3, 4)
