"""Camera model math: depth <-> pointmaps <-> rays, intrinsics recovery.

Convention parity with the reference (``mapanything/utils/geometry.py``):
OpenCV RDF camera frame, pinhole intrinsics, pixel centers at integer
coordinates (x_grid = arange(W)), cam2world poses.

All functions take arbitrary leading batch dims and are jit/vmap friendly;
heights/widths are static Python ints (XLA static shapes).
"""

from __future__ import annotations

import jax.numpy as jnp

from mapanything_tpu.geometry.quaternion import quat_rotate


def pixel_grid(height: int, width: int, dtype=jnp.float32) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Integer pixel-center grids (x, y), each (H, W)."""
    y = jnp.arange(height, dtype=dtype)[:, None]
    x = jnp.arange(width, dtype=dtype)[None, :]
    return jnp.broadcast_to(x, (height, width)), jnp.broadcast_to(y, (height, width))


def depthmap_to_camera_frame(
    depthmap: jnp.ndarray, intrinsics: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Unproject a z-depth map to a camera-frame pointmap.

    Parity: ``depthmap_to_camera_frame`` (reference geometry.py:24).

    Args:
        depthmap:   (..., H, W) z-depth.
        intrinsics: (..., 3, 3) pinhole K.

    Returns:
        (pts3d_cam (..., H, W, 3), valid_mask (..., H, W) where depth > 0).
    """
    h, w = depthmap.shape[-2:]
    x_grid, y_grid = pixel_grid(h, w, depthmap.dtype)

    fx = intrinsics[..., 0, 0][..., None, None]
    fy = intrinsics[..., 1, 1][..., None, None]
    cx = intrinsics[..., 0, 2][..., None, None]
    cy = intrinsics[..., 1, 2][..., None, None]

    xx = (x_grid - cx) * depthmap / fx
    yy = (y_grid - cy) * depthmap / fy
    pts3d_cam = jnp.stack([xx, yy, depthmap], axis=-1)
    valid_mask = depthmap > 0.0
    return pts3d_cam, valid_mask


def depthmap_to_world_frame(
    depthmap: jnp.ndarray,
    intrinsics: jnp.ndarray,
    camera_pose: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Unproject a z-depth map to a world-frame pointmap via cam2world pose.

    Parity: ``depthmap_to_world_frame`` (reference geometry.py:76).
    """
    pts3d_cam, valid_mask = depthmap_to_camera_frame(depthmap, intrinsics)
    if camera_pose is None:
        return pts3d_cam, valid_mask
    rot = camera_pose[..., None, None, :3, :3]
    t = camera_pose[..., None, None, :3, 3]
    pts3d_world = jnp.einsum("...ik,...k->...i", rot, pts3d_cam) + t
    return pts3d_world, valid_mask


def transform_pts3d(pts3d: jnp.ndarray, transformation: jnp.ndarray) -> jnp.ndarray:
    """Apply a (..., 4, 4) rigid transform to (..., H, W, 3) points.

    Parity: ``transform_pts3d`` (reference geometry.py:117).
    """
    rot = transformation[..., None, None, :3, :3]
    t = transformation[..., None, None, :3, 3]
    return jnp.einsum("...ik,...k->...i", rot, pts3d) + t


def project_pts3d_to_image(
    pts3d: jnp.ndarray, intrinsics: jnp.ndarray, return_z_dim: bool = False
) -> jnp.ndarray:
    """Project camera-frame points (..., 3) to pixel coordinates.

    Parity: ``project_pts3d_to_image`` (reference geometry.py:152).
    Returns (..., 2) pixels, or (..., 3) with z appended if requested.
    """
    z = pts3d[..., 2:3]
    uv_h = jnp.einsum("...ij,...j->...i", intrinsics, pts3d)
    uv = uv_h[..., :2] / jnp.where(jnp.abs(z) < 1e-8, 1e-8, z)
    if return_z_dim:
        return jnp.concatenate([uv, z], axis=-1)
    return uv


def rays_in_camera_frame(
    intrinsics: jnp.ndarray,
    height: int,
    width: int,
    normalize_to_unit_sphere: bool = True,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-pixel ray origins (zeros) and directions in camera frame.

    Parity: ``get_rays_in_camera_frame`` (reference geometry.py:186).

    Args:
        intrinsics: (..., 3, 3).
    Returns:
        (ray_origins (..., H, W, 3), ray_directions (..., H, W, 3)).
        Directions are unit-sphere normalized if requested, else unit-plane
        (z = 1).
    """
    dtype = intrinsics.dtype
    x_grid, y_grid = pixel_grid(height, width, dtype)

    fx = intrinsics[..., 0, 0][..., None, None]
    fy = intrinsics[..., 1, 1][..., None, None]
    cx = intrinsics[..., 0, 2][..., None, None]
    cy = intrinsics[..., 1, 2][..., None, None]

    xx = (x_grid - cx) / fx
    yy = (y_grid - cy) / fy
    dirs = jnp.stack([xx, yy, jnp.ones_like(xx)], axis=-1)
    if normalize_to_unit_sphere:
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    origins = jnp.zeros(dirs.shape, dtype)
    return origins, dirs


def rays_in_world_frame(
    intrinsics: jnp.ndarray,
    height: int,
    width: int,
    normalize_to_unit_sphere: bool = True,
    camera_pose: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-pixel rays in world frame given a cam2world pose.

    Parity: ``get_rays_in_world_frame`` (reference geometry.py:244).
    """
    origins, dirs = rays_in_camera_frame(
        intrinsics, height, width, normalize_to_unit_sphere
    )
    if camera_pose is None:
        return origins, dirs
    rot = camera_pose[..., None, None, :3, :3]
    t = camera_pose[..., None, None, :3, 3]
    origins_w = jnp.einsum("...ik,...k->...i", rot, origins) + t
    dirs_w = jnp.einsum("...ik,...k->...i", rot, dirs)
    return origins_w, dirs_w


def recover_pinhole_intrinsics_from_ray_directions(
    ray_directions: jnp.ndarray,
) -> jnp.ndarray:
    """Recover pinhole K from a unit-sphere ray-direction map by least squares.

    Parity: ``recover_pinhole_intrinsics_from_ray_directions``
    (reference geometry.py:304). Solves, per image, the 1-D least-squares
    problems ``u = fx * (x/z) + cx`` and ``v = fy * (y/z) + cy`` in closed
    form (normal equations over all pixels).

    Args:
        ray_directions: (..., H, W, 3).

    Returns:
        intrinsics (..., 3, 3).
    """
    h, w = ray_directions.shape[-3:-1]
    dtype = ray_directions.dtype
    x_grid, y_grid = pixel_grid(h, w, dtype)

    z = ray_directions[..., 2]
    safe_z = jnp.where(jnp.abs(z) < 1e-8, 1e-8, z)
    xz = ray_directions[..., 0] / safe_z  # tan-space x
    yz = ray_directions[..., 1] / safe_z

    def solve_axis(t, u):
        # Fit u = f * t + c over pixels: closed-form 2x2 normal equations.
        n = float(h * w)
        st = jnp.sum(t, axis=(-2, -1))
        su = jnp.sum(u, axis=(-2, -1))
        stt = jnp.sum(t * t, axis=(-2, -1))
        stu = jnp.sum(t * u, axis=(-2, -1))
        denom = n * stt - st * st
        denom = jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
        f = (n * stu - st * su) / denom
        c = (su - f * st) / n
        return f, c

    u = jnp.broadcast_to(x_grid, xz.shape)
    v = jnp.broadcast_to(y_grid, yz.shape)
    fx, cx = solve_axis(xz, u)
    fy, cy = solve_axis(yz, v)

    batch_shape = fx.shape
    K = jnp.zeros(batch_shape + (3, 3), dtype)
    K = K.at[..., 0, 0].set(fx)
    K = K.at[..., 1, 1].set(fy)
    K = K.at[..., 0, 2].set(cx)
    K = K.at[..., 1, 2].set(cy)
    K = K.at[..., 2, 2].set(1.0)
    return K


def convert_z_depth_to_depth_along_ray(
    z_depth: jnp.ndarray, intrinsics: jnp.ndarray
) -> jnp.ndarray:
    """z-depth (..., H, W) -> depth along the unit-plane ray.

    Parity: ``convert_z_depth_to_depth_along_ray`` (reference geometry.py:496).
    """
    h, w = z_depth.shape[-2:]
    _, dirs = rays_in_camera_frame(intrinsics, h, w, normalize_to_unit_sphere=False)
    pts3d_cam = z_depth[..., None] * dirs
    return jnp.linalg.norm(pts3d_cam, axis=-1)


def depth_along_ray_to_z_depth(
    depth_along_ray: jnp.ndarray, ray_directions: jnp.ndarray
) -> jnp.ndarray:
    """Depth along unit-sphere rays (..., H, W[, 1]) -> z-depth (..., H, W).

    Inverse of the factored representation: z = d * dir_z (used by the
    inference postprocess, reference utils/inference.py:314).
    """
    if depth_along_ray.shape[-1] == 1 and depth_along_ray.ndim == ray_directions.ndim:
        depth_along_ray = depth_along_ray[..., 0]
    return depth_along_ray * ray_directions[..., 2]


def pts3d_cam_from_rays_depth(
    ray_directions: jnp.ndarray, depth_along_ray: jnp.ndarray
) -> jnp.ndarray:
    """Camera-frame pointmap from unit ray dirs (..., 3) and depth (..., 1)."""
    return ray_directions * depth_along_ray


def pointmap_from_rays_depth_pose(
    ray_directions: jnp.ndarray,
    depth_along_ray: jnp.ndarray,
    pose_trans: jnp.ndarray,
    pose_quats: jnp.ndarray,
) -> jnp.ndarray:
    """World-frame pointmap from the factored scene representation.

    Parity: ``convert_ray_dirs_depth_along_ray_pose_trans_quats_to_pointmap``
    (reference geometry.py:855).

    Args:
        ray_directions: (..., H, W, 3) unit rays in camera frame.
        depth_along_ray: (..., H, W, 1).
        pose_trans: (..., 3) cam2world translation.
        pose_quats: (..., 4) cam2world XYZW quaternion.
    """
    pts3d_local = depth_along_ray * ray_directions
    quats = pose_quats[..., None, None, :]
    trans = pose_trans[..., None, None, :]
    return quat_rotate(quats, pts3d_local) + trans


def colmap_to_opencv_intrinsics(K: jnp.ndarray) -> jnp.ndarray:
    """COLMAP (pixel center at 0.5) -> OpenCV (center at 0) principal point.

    Parity: reference geometry.py:1566.
    """
    return K.at[..., :2, 2].add(-0.5)


def opencv_to_colmap_intrinsics(K: jnp.ndarray) -> jnp.ndarray:
    """OpenCV -> COLMAP principal point convention. (reference geometry.py:1580)."""
    return K.at[..., :2, 2].add(0.5)
