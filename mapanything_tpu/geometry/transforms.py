"""Rigid-transform utilities: pose inverse, relative poses, point transforms.

Parity with reference ``mapanything/utils/geometry.py:964-1212`` (geotrf,
inv, closed_form_pose_inverse, relative_pose_transformation), written for
arbitrary leading batch dims in jnp.
"""

from __future__ import annotations

import jax.numpy as jnp


def geotrf(trf: jnp.ndarray, pts: jnp.ndarray, norm: bool = False) -> jnp.ndarray:
    """Apply a geometric transform to points.

    Parity: ``geotrf`` (reference geometry.py:964), for the tensor path.

    Args:
        trf: (..., 3, 3), (..., 3, 4) or (..., 4, 4) transform. Leading dims
            must broadcast against the points' leading (batch) dims.
        pts: (..., N, 3) or (..., H, W, 3) points.
        norm: if True, divide by the homogeneous coordinate.
    """
    d = pts.shape[-1]
    n_extra = pts.ndim - trf.ndim + 1  # spatial dims beyond batch (N,) or (H, W)
    mat = trf.reshape(trf.shape[:-2] + (1,) * n_extra + trf.shape[-2:])

    lin = mat[..., :d, :d]
    out = jnp.einsum("...ik,...k->...i", lin, pts)
    if trf.shape[-1] > d:
        out = out + mat[..., :d, d]
    if norm and trf.shape[-2] > d:
        w = jnp.einsum("...k,...k->...", mat[..., d, :d], pts) + mat[..., d, d]
        out = out / jnp.where(jnp.abs(w[..., None]) < 1e-12, 1e-12, w[..., None])
    return out


def closed_form_pose_inverse(
    pose: jnp.ndarray,
) -> jnp.ndarray:
    """Invert rigid 4x4 (or 3x4) cam2world/world2cam poses in closed form.

    Parity: ``closed_form_pose_inverse`` (reference geometry.py:1051):
    inv = [[R^T, -R^T t], [0, 1]]. Cheaper and better-conditioned than a
    general matrix inverse.
    """
    rot_t = jnp.swapaxes(pose[..., :3, :3], -1, -2)
    t_inv = -jnp.einsum("...ij,...j->...i", rot_t, pose[..., :3, 3])
    top = jnp.concatenate([rot_t, t_inv[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=pose.dtype),
        pose.shape[:-2] + (1, 4),
    )
    return jnp.concatenate([top, bottom], axis=-2)


# Alias matching the reference name ``inv`` (geometry.py:1040).
inv_pose = closed_form_pose_inverse


def relative_pose_transformation(
    trans_01: jnp.ndarray, trans_02: jnp.ndarray
) -> jnp.ndarray:
    """Relative transform trans_12 = inv(trans_01) @ trans_02.

    Parity: ``relative_pose_transformation`` (reference geometry.py:1139).
    """
    return jnp.einsum("...ij,...jk->...ik", closed_form_pose_inverse(trans_01), trans_02)


def extri_to_homo(extris: jnp.ndarray) -> jnp.ndarray:
    """Pad (..., 3, 4) extrinsics to homogeneous (..., 4, 4).

    Parity: ``extri_to_homo`` (reference geometry.py:1106).
    """
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=extris.dtype),
        extris.shape[:-2] + (1, 4),
    )
    return jnp.concatenate([extris, bottom], axis=-2)
