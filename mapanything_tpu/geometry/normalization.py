"""Scale normalization for depths, translations, and pointclouds.

Parity with reference ``mapanything/utils/geometry.py:1594-1753``. The
reference operates on Python lists of per-view tensors; here everything is a
single stacked array with an explicit view axis — the TPU-native layout
(static shapes, vectorized over views).
"""

from __future__ import annotations

import jax.numpy as jnp


def safe_norm(x: jnp.ndarray, axis=-1, keepdims: bool = False) -> jnp.ndarray:
    """L2 norm whose gradient at exactly 0 is 0 instead of NaN.

    ``jnp.linalg.norm`` backpropagates x/||x|| = 0/0 = NaN at the origin;
    torch returns the 0 subgradient there, so the reference never NaNs on
    an all-zero pixel. This matters in practice: a depth logit below ~-87
    underflows exp to exactly 0.0, the pointmap pixel becomes the zero
    vector, and one such pixel turns the ENTIRE gradient to NaN through
    the joint normalization — observed on-chip at lr=1e-4 from random
    init (docs/PERFORMANCE.md "Production-lr stability"). The double-
    ``where`` keeps the forward bit-exact and kills the NaN cotangent.
    """
    sq = jnp.sum(x * x, axis=axis, keepdims=keepdims)
    zero = sq == 0
    root = jnp.sqrt(jnp.where(zero, 1.0, sq))
    return jnp.where(zero, 0.0, root)


def normalize_depth_using_non_zero_pixels(
    depth: jnp.ndarray, return_norm_factor: bool = False
):
    """Normalize depth by the mean of its non-zero pixels.

    Parity: reference geometry.py:1594.

    Args:
        depth: (B, ..., 1) depth with zeros marking invalid pixels; the mean
            is taken per leading-batch element over all remaining dims.
    Returns:
        normalized depth (same shape) [, norm factor (B,)].
    """
    reduce_axes = tuple(range(1, depth.ndim))
    valid = depth > 0
    valid_sum = jnp.sum(jnp.where(valid, depth, 0.0), axis=reduce_axes)
    valid_count = jnp.sum(valid, axis=reduce_axes)
    norm_factor = valid_sum / (valid_count + 1e-8)
    norm_factor = jnp.maximum(norm_factor, 1e-8)
    bshape = (depth.shape[0],) + (1,) * (depth.ndim - 1)
    normalized = depth / norm_factor.reshape(bshape)
    if return_norm_factor:
        return normalized, norm_factor
    return normalized


def normalize_pose_translations(
    pose_translations: jnp.ndarray, return_norm_factor: bool = False
):
    """Normalize (B, V, 3) translations by mean norm of non-zero translations.

    Parity: reference geometry.py:1629.
    """
    dist = safe_norm(pose_translations, axis=-1)  # (B, V)
    nonzero = dist > 0
    norm_factor = jnp.sum(dist, axis=1) / (jnp.sum(nonzero, axis=1) + 1e-8)
    norm_factor = jnp.maximum(norm_factor, 1e-8)
    normalized = pose_translations / norm_factor[:, None, None]
    if return_norm_factor:
        return normalized, norm_factor
    return normalized


def normalize_pointcloud(
    pts: jnp.ndarray,
    valid_mask: jnp.ndarray | None = None,
    norm_mode: str = "avg_dis",
    ret_factor: bool = False,
):
    """Jointly normalize a stacked multi-view pointcloud.

    Parity: ``normalize_multiple_pointclouds`` (reference geometry.py:1669),
    with the per-view list replaced by a single (B, V, H, W, 3) array (any
    (B, ..., 3) works; stats reduce over all non-batch dims).

    Args:
        pts: (B, ..., 3) points.
        valid_mask: optional (B, ...) boolean mask.
        norm_mode: "{norm}_{dis}"; norm must be "avg"; dis in
            {"dis", "log1p", "warp-log1p"}.
    Returns:
        normalized points (same shape) [, norm factor (B, 1...1, 1)].
    """
    norm, dis_mode = norm_mode.split("_", 1)
    assert norm == "avg", f"unsupported norm mode {norm}"

    if valid_mask is None:
        valid_mask = jnp.ones(pts.shape[:-1], bool)
    pts_z = jnp.where(valid_mask[..., None], pts, 0.0)

    reduce_axes = tuple(range(1, pts.ndim - 1))
    dis = safe_norm(pts_z, axis=-1)  # (B, ...)

    if dis_mode == "dis":
        pass
    elif dis_mode == "log1p":
        dis = jnp.log1p(dis)
    elif dis_mode == "warp-log1p":
        log_dis = jnp.log1p(dis)
        warp = log_dis / jnp.maximum(dis, 1e-8)
        pts = pts * warp[..., None]
        dis = log_dis
    else:
        raise ValueError(f"bad dis_mode={dis_mode}")

    nnz = jnp.sum(valid_mask, axis=reduce_axes)
    norm_factor = jnp.sum(jnp.where(valid_mask, dis, 0.0), axis=reduce_axes) / (
        nnz + 1e-8
    )
    norm_factor = jnp.maximum(norm_factor, 1e-8)
    nf = norm_factor.reshape((pts.shape[0],) + (1,) * (pts.ndim - 1))
    res = pts / nf
    if ret_factor:
        return res, nf
    return res


def apply_log_to_norm(x: jnp.ndarray) -> jnp.ndarray:
    """Rescale vectors to log1p of their norm, keeping direction.

    Parity: ``apply_log_to_norm`` (reference geometry.py:1737). Used to
    log-compress pointmaps/depths before regression losses.
    """
    d = safe_norm(x, axis=-1, keepdims=True)
    return x / jnp.maximum(d, 1e-8) * jnp.log1p(d)
