"""Quaternion algebra (XYZW, scalar-last) as pure jnp functions.

Convention parity with the reference implementation
(``mapanything/utils/geometry.py:601-855``): unit quaternions stored as
``(x, y, z, w)``, OpenCV RDF camera frames, cam2world poses.

Unlike the reference (which special-cases 1-D vs batched inputs with
unsqueeze/squeeze), every function here accepts arbitrary leading batch
dimensions ``(..., 4)`` / ``(..., 3)`` and is fully vmap/jit friendly.
"""

from __future__ import annotations

import jax.numpy as jnp

from mapanything_tpu.geometry.normalization import safe_norm


def quat_normalize(quat: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Normalize quaternions to unit norm. (..., 4) -> (..., 4)."""
    # safe_norm: NaN-free gradient if a predicted quat is exactly 0
    norm = safe_norm(quat, axis=-1, keepdims=True)
    return quat / jnp.maximum(norm, eps)


def quat_to_rotmat(quat: jnp.ndarray) -> jnp.ndarray:
    """Convert unit quaternions (..., 4) XYZW to rotation matrices (..., 3, 3).

    Parity: ``quaternion_to_rotation_matrix`` (reference geometry.py:601).
    """
    quat = quat_normalize(quat)
    x, y, z, w = jnp.moveaxis(quat, -1, 0)

    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z

    rot = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return rot.reshape(quat.shape[:-1] + (3, 3))


def _sqrt_positive_part(x: jnp.ndarray) -> jnp.ndarray:
    """sqrt(max(0, x)) with zero subgradient at x == 0."""
    positive = x > 0
    safe = jnp.where(positive, x, 1.0)
    return jnp.where(positive, jnp.sqrt(safe), jnp.zeros_like(x))


def rotmat_to_quat(matrix: jnp.ndarray) -> jnp.ndarray:
    """Convert rotation matrices (..., 3, 3) to XYZW quaternions (..., 4).

    Numerically-robust branch-free variant of the candidate-selection scheme
    (reference geometry.py:655, itself from PyTorch3D): compute the
    quaternion via each of the four candidate denominators and pick the
    best-conditioned one with a one-hot select.
    """
    batch_shape = matrix.shape[:-2]
    m = matrix.reshape(batch_shape + (9,))
    m00, m01, m02, m10, m11, m12, m20, m21, m22 = jnp.moveaxis(m, -1, 0)

    q_abs = _sqrt_positive_part(
        jnp.stack(
            [
                1.0 + m00 + m11 + m22,
                1.0 + m00 - m11 - m22,
                1.0 - m00 + m11 - m22,
                1.0 - m00 - m11 + m22,
            ],
            axis=-1,
        )
    )

    # Candidate quaternions in WXYZ ("rijk") order, each scaled by 2*q_abs[i].
    quat_by_rijk = jnp.stack(
        [
            jnp.stack([q_abs[..., 0] ** 2, m21 - m12, m02 - m20, m10 - m01], axis=-1),
            jnp.stack([m21 - m12, q_abs[..., 1] ** 2, m10 + m01, m02 + m20], axis=-1),
            jnp.stack([m02 - m20, m10 + m01, q_abs[..., 2] ** 2, m12 + m21], axis=-1),
            jnp.stack([m10 - m01, m20 + m02, m21 + m12, q_abs[..., 3] ** 2], axis=-1),
        ],
        axis=-2,
    )
    flr = jnp.asarray(0.1, dtype=q_abs.dtype)
    quat_candidates = quat_by_rijk / (2.0 * jnp.maximum(q_abs[..., None], flr))

    best = jnp.argmax(q_abs, axis=-1)
    onehot = jnp.eye(4, dtype=matrix.dtype)[best]  # (..., 4)
    out = jnp.sum(quat_candidates * onehot[..., None], axis=-2)  # (..., 4) WXYZ

    out = out[..., jnp.array([1, 2, 3, 0])]  # WXYZ -> XYZW
    return quat_standardize(out)


def quat_standardize(quat: jnp.ndarray) -> jnp.ndarray:
    """Force a non-negative real (w) part. (reference geometry.py:730)."""
    return jnp.where(quat[..., 3:4] < 0, -quat, quat)


def quat_inverse(quat: jnp.ndarray) -> jnp.ndarray:
    """Quaternion inverse: conjugate / squared-norm. (reference geometry.py:745)."""
    conj = quat * jnp.asarray([-1.0, -1.0, -1.0, 1.0], dtype=quat.dtype)
    sq_norm = jnp.sum(quat * quat, axis=-1, keepdims=True)
    return conj / jnp.maximum(sq_norm, 1e-12)


def quat_multiply(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product of XYZW quaternions. (reference geometry.py:775)."""
    x1, y1, z1, w1 = jnp.moveaxis(q1, -1, 0)
    x2, y2, z2, w2 = jnp.moveaxis(q2, -1, 0)
    x = w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2
    y = w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2
    z = w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2
    w = w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2
    return jnp.stack([x, y, z, w], axis=-1)


def quat_rotate(quat: jnp.ndarray, vec: jnp.ndarray) -> jnp.ndarray:
    """Rotate vectors (..., 3) by unit quaternions (..., 4).

    Uses the 2-cross-product formula: v + 2*w*(q x v) + 2*(q x (q x v)),
    avoiding the explicit 3x3 matrix (cheaper under vmap over pixels).
    """
    qvec = quat[..., :3]
    w = quat[..., 3:4]
    uv = jnp.cross(qvec, vec)
    uuv = jnp.cross(qvec, uv)
    return vec + 2.0 * (w * uv + uuv)


def relative_pose_quats_trans(
    quats1: jnp.ndarray,
    trans1: jnp.ndarray,
    quats2: jnp.ndarray,
    trans2: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Express pose2 (cam2world) relative to pose1's frame (cam2 -> cam1).

    Parity: ``transform_pose_using_quats_and_trans_2_to_1``
    (reference geometry.py:814).

    Args:
        quats1, trans1: reference pose (..., 4) / (..., 3), cam2world.
        quats2, trans2: pose to re-express, same shapes.

    Returns:
        (quats_rel, trans_rel): pose2 in pose1's camera frame.
    """
    inv_q1 = quat_inverse(quats1)
    quats_rel = quat_multiply(inv_q1, quats2)
    trans_rel = quat_rotate(inv_q1, trans2 - trans1)
    return quats_rel, trans_rel


def quats_trans_to_pose_matrix(quats: jnp.ndarray, trans: jnp.ndarray) -> jnp.ndarray:
    """Build 4x4 cam2world pose matrices from XYZW quats + translation."""
    rot = quat_to_rotmat(quats)  # (..., 3, 3)
    batch_shape = rot.shape[:-2]
    top = jnp.concatenate([rot, trans[..., :, None]], axis=-1)  # (..., 3, 4)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=rot.dtype), batch_shape + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def pose_matrix_to_quats_trans(pose: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Split 4x4 (or 3x4) cam2world matrices into (XYZW quats, translation)."""
    quats = rotmat_to_quat(pose[..., :3, :3])
    trans = pose[..., :3, 3]
    return quats, trans
