"""Train-time GT non-ambiguous-mask computation ([FORK] feature).

Parity: ``calculate_non_ambiguous_mask`` (reference model.py:770-790) —
during training the fork recomputes per-view frustum-consistency masks
from GT depth/poses (cross-view re-observation), refining the dataset's
non_ambiguous_mask and the loss validity mask. Runs as a pure function on
the LossBatch before the loss (the reference runs it inside forward under
no_grad; keeping it out of the model keeps the forward modality-pure).
"""

from __future__ import annotations

import jax.numpy as jnp

from mapanything_tpu.geometry.frustum import calculate_in_frustum_mask
from mapanything_tpu.geometry.quaternion import quats_trans_to_pose_matrix
from mapanything_tpu.train.losses import LossBatch


def refine_batch_with_frustum_masks(batch: LossBatch, intrinsics: jnp.ndarray) -> LossBatch:
    """Refine non-ambiguous / valid masks by cross-view frustum consistency.

    Args:
        batch: GT batch; depth_z derived from pts3d_cam.
        intrinsics: (B, V, 3, 3) GT pinhole K per view.

    Returns:
        batch with updated non_ambiguous_mask, valid_non_ambiguous_mask,
        and valid_mask (valid & mask & mask_valid, reference model.py:788).
    """
    depth_z = batch.pts3d_cam[..., 2]  # (B, V, H, W)
    c2w = quats_trans_to_pose_matrix(
        batch.camera_pose_quats, batch.camera_pose_trans
    )  # (B, V, 4, 4)

    mask, valid = calculate_in_frustum_mask(
        depth_z, intrinsics, c2w, batch.non_ambiguous_mask,
        depth_z, intrinsics, c2w, batch.non_ambiguous_mask,
    )
    return batch.replace(
        non_ambiguous_mask=mask,
        valid_non_ambiguous_mask=valid,
        valid_mask=batch.valid_mask & mask & valid,
    )
