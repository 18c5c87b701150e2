"""Normal maps and edge masks from pointmaps/depths, as pure jnp.

Parity with reference ``mapanything/utils/geometry.py:1788-2260``
(points_to_normals, depth_edge, normals_edge). The reference computes these
in numpy on CPU during postprocessing; here they are jnp so the whole
postprocess runs fused on-device (the max-pools lower to XLA reduce-window,
which maps well onto the VPU).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _max_pool_2d(x: jnp.ndarray, kernel_size: int) -> jnp.ndarray:
    """Same-padded max pool with stride 1 over the last two dims."""
    pad = kernel_size // 2
    ndim = x.ndim
    window = (1,) * (ndim - 2) + (kernel_size, kernel_size)
    strides = (1,) * ndim
    padding = [(0, 0)] * (ndim - 2) + [(pad, pad), (pad, pad)]
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, window, strides, padding
    )


def depth_edge(
    depth: jnp.ndarray,
    atol: float | None = None,
    rtol: float | None = None,
    kernel_size: int = 3,
    mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Mark pixels whose k x k neighborhood has a large depth range.

    Parity: ``depth_edge`` (reference geometry.py:2102).

    Args:
        depth: (..., H, W) linear depth.
        atol / rtol: absolute / relative range tolerance (either or both).
        mask: optional validity mask; invalid pixels are excluded from the
            neighborhood extrema.
    """
    if mask is None:
        diff = _max_pool_2d(depth, kernel_size) + _max_pool_2d(-depth, kernel_size)
    else:
        neg_inf = -jnp.inf
        diff = _max_pool_2d(jnp.where(mask, depth, neg_inf), kernel_size) + _max_pool_2d(
            jnp.where(mask, -depth, neg_inf), kernel_size
        )

    edge = jnp.zeros(depth.shape, bool)
    if atol is not None:
        edge |= diff > atol
    if rtol is not None:
        edge |= diff / jnp.where(depth == 0, jnp.inf, depth) > rtol
    return edge


def points_to_normals(
    point: jnp.ndarray, mask: jnp.ndarray | None = None
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Normal map from a pointmap via 4-neighbor cross products.

    Parity: ``points_to_normals`` (reference geometry.py:1788) without the
    edge_threshold option (unused by the inference path).

    Args:
        point: (..., H, W, 3) pointmap (camera or world frame).
        mask: optional (..., H, W) bool validity mask.

    Returns:
        (normal (..., H, W, 3) unit vectors, normal_mask (..., H, W)).
    """
    if mask is None:
        mask_arr = jnp.ones(point.shape[:-1], bool)
    else:
        mask_arr = mask

    batch = point.shape[:-3]
    pad_pt = [(0, 0)] * len(batch) + [(1, 1), (1, 1), (0, 0)]
    pad_mk = [(0, 0)] * len(batch) + [(1, 1), (1, 1)]
    pts = jnp.pad(point, pad_pt)
    mk = jnp.pad(mask_arr, pad_mk)

    center = pts[..., 1:-1, 1:-1, :]
    up = pts[..., :-2, 1:-1, :] - center
    left = pts[..., 1:-1, :-2, :] - center
    down = pts[..., 2:, 1:-1, :] - center
    right = pts[..., 1:-1, 2:, :] - center

    normals = jnp.stack(
        [
            jnp.cross(up, left),
            jnp.cross(left, down),
            jnp.cross(down, right),
            jnp.cross(right, up),
        ],
        axis=0,
    )
    normals = normals / (jnp.linalg.norm(normals, axis=-1, keepdims=True) + 1e-12)

    m_up = mk[..., :-2, 1:-1]
    m_left = mk[..., 1:-1, :-2]
    m_down = mk[..., 2:, 1:-1]
    m_right = mk[..., 1:-1, 2:]
    m_center = mk[..., 1:-1, 1:-1]
    valid = (
        jnp.stack(
            [m_up & m_left, m_left & m_down, m_down & m_right, m_right & m_up],
            axis=0,
        )
        & m_center[None]
    )

    normal = jnp.sum(normals * valid[..., None], axis=0)
    normal = normal / (jnp.linalg.norm(normal, axis=-1, keepdims=True) + 1e-12)
    normal_mask = jnp.any(valid, axis=0)
    normal = jnp.where(normal_mask[..., None], normal, 0.0)
    return normal, normal_mask


def normals_edge(
    normals: jnp.ndarray,
    tol_deg: float,
    kernel_size: int = 3,
    mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Mark pixels where the normal direction varies sharply in a k x k window.

    Parity: ``normals_edge`` (reference geometry.py:2200). Instead of
    materializing sliding windows (reference's stride-tricks), we compute the
    max angular deviation via a min-cosine reduce-window per channel — same
    result, TPU-friendly.
    """
    normals = normals / (jnp.linalg.norm(normals, axis=-1, keepdims=True) + 1e-12)
    pad = kernel_size // 2
    batch = normals.shape[:-3]

    # cos(angle between center pixel and each neighbor) =
    #   n_c . n_w  -- handled by maximizing over the window of dot products.
    # We can't reduce over a window of dot products directly without forming
    # windows, so use: for each shift (di, dj), compute the dot product with
    # the shifted normal map and track the max angle. k*k shifted dots is
    # O(k^2 HW) — same cost as the window approach, fully fused by XLA.
    pad_spec = [(0, 0)] * len(batch) + [(pad, pad), (pad, pad), (0, 0)]
    padded = jnp.pad(normals, pad_spec, mode="edge")
    if mask is not None:
        mask_pad = jnp.pad(
            mask, [(0, 0)] * len(batch) + [(pad, pad), (pad, pad)], mode="edge"
        )

    h, w = normals.shape[-3:-1]
    max_angle = jnp.zeros(normals.shape[:-1], normals.dtype)
    for di in range(kernel_size):
        for dj in range(kernel_size):
            shifted = padded[..., di : di + h, dj : dj + w, :]
            cos = jnp.clip(jnp.sum(normals * shifted, axis=-1), -1.0, 1.0)
            angle = jnp.arccos(cos)
            if mask is not None:
                angle = jnp.where(mask_pad[..., di : di + h, dj : dj + w], angle, 0.0)
            max_angle = jnp.maximum(max_angle, angle)

    max_angle = _max_pool_2d(max_angle, kernel_size)
    return max_angle > jnp.deg2rad(tol_deg)


def angle_diff_vec3(v1: jnp.ndarray, v2: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Angle between 3-vectors via atan2(|cross|, dot). (reference geometry.py:1753)."""
    cross = jnp.linalg.norm(jnp.cross(v1, v2), axis=-1)
    dot = jnp.sum(v1 * v2, axis=-1)
    return jnp.arctan2(cross, dot + eps)
