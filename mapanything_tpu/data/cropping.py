"""Image crop/rescale with intrinsics bookkeeping (host-side numpy/cv2).

Parity: ``mapanything/utils/cropping.py`` (camera_matrix_of_crop :283,
bbox_from_intrinsics_in_out :363, rescale/crop helpers) — principal-point
aware scaling in COLMAP convention, Lanczos image downscaling, nearest
interpolation for depth/masks.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import cv2
import numpy as np


def opencv_to_colmap_intrinsics(K: np.ndarray) -> np.ndarray:
    K = K.copy()
    K[:2, 2] += 0.5
    return K


def colmap_to_opencv_intrinsics(K: np.ndarray) -> np.ndarray:
    K = K.copy()
    K[:2, 2] -= 0.5
    return K


def rescale_image_and_info(
    image: np.ndarray,
    output_resolution: Tuple[int, int],
    depthmap: Optional[np.ndarray] = None,
    intrinsics: Optional[np.ndarray] = None,
    nearest_extras: Optional[Dict[str, np.ndarray]] = None,
    force: bool = True,
):
    """Scale so the image just covers ``output_resolution`` (width, height).

    Parity: ``rescale_image_and_other_optional_info`` (cropping.py:188):
    uniform scale = max(out_w / in_w, out_h / in_h) (never upscales unless
    forced), Lanczos for RGB, nearest for depth/masks, intrinsics scaled in
    COLMAP convention.
    """
    h, w = image.shape[:2]
    out_w, out_h = int(output_resolution[0]), int(output_resolution[1])
    scale = max(out_w / w, out_h / h)
    if scale >= 1.0 and not force:
        scale = 1.0
    new_w, new_h = round(w * scale), round(h * scale)

    interp = cv2.INTER_LANCZOS4 if scale < 1.0 else cv2.INTER_CUBIC
    image = cv2.resize(image, (new_w, new_h), interpolation=interp)
    if depthmap is not None:
        depthmap = cv2.resize(depthmap, (new_w, new_h), interpolation=cv2.INTER_NEAREST)
    if nearest_extras is not None:
        nearest_extras = {
            k: cv2.resize(v.astype(np.float32), (new_w, new_h), interpolation=cv2.INTER_NEAREST).astype(v.dtype)
            for k, v in nearest_extras.items()
        }
    if intrinsics is not None:
        K = opencv_to_colmap_intrinsics(intrinsics)
        K[0, :] *= new_w / w
        K[1, :] *= new_h / h
        intrinsics = colmap_to_opencv_intrinsics(K)
    return image, depthmap, intrinsics, nearest_extras


def camera_matrix_of_crop(
    input_camera_matrix: np.ndarray,
    input_resolution,
    output_resolution,
    offset_factor: float = 0.5,
) -> np.ndarray:
    """Intrinsics for a centered crop (cropping.py:283)."""
    margins = np.asarray(input_resolution, np.float64) - np.asarray(output_resolution)
    assert np.all(margins >= 0.0), (input_resolution, output_resolution)
    offset = offset_factor * margins
    K = opencv_to_colmap_intrinsics(input_camera_matrix)
    K[:2, 2] -= offset
    return colmap_to_opencv_intrinsics(K)


def bbox_from_intrinsics_in_out(
    input_camera_matrix, output_camera_matrix, output_resolution
) -> Tuple[int, int, int, int]:
    """Crop bbox implied by the intrinsics change (cropping.py:363)."""
    out_w, out_h = output_resolution
    l = int(round(input_camera_matrix[0, 2] - output_camera_matrix[0, 2]))
    t = int(round(input_camera_matrix[1, 2] - output_camera_matrix[1, 2]))
    return (l, t, l + out_w, t + out_h)


def crop_image_and_info(
    image: np.ndarray,
    crop_bbox: Tuple[int, int, int, int],
    depthmap: Optional[np.ndarray] = None,
    intrinsics: Optional[np.ndarray] = None,
    nearest_extras: Optional[Dict[str, np.ndarray]] = None,
):
    """Crop image/depth/extras and shift the principal point (cropping.py:320)."""
    l, t, r, b = crop_bbox
    image = image[t:b, l:r]
    if depthmap is not None:
        depthmap = depthmap[t:b, l:r]
    if nearest_extras is not None:
        nearest_extras = {k: v[t:b, l:r] for k, v in nearest_extras.items()}
    if intrinsics is not None:
        K = intrinsics.copy()
        K[0, 2] -= l
        K[1, 2] -= t
        intrinsics = K
    return image, depthmap, intrinsics, nearest_extras


def crop_resize_if_necessary(
    image: np.ndarray,
    resolution: Tuple[int, int],
    depthmap: Optional[np.ndarray] = None,
    intrinsics: Optional[np.ndarray] = None,
    nearest_extras: Optional[Dict[str, np.ndarray]] = None,
    principal_point_centered: bool = False,
    rng: Optional[np.random.Generator] = None,
    aug_crop: int = 0,
):
    """Full crop/resize pipeline (BaseDataset._crop_resize_if_necessary,
    base_dataset.py:213): optional principal-point-centered pre-crop,
    Lanczos rescale (optionally over-sized by aug_crop), then final crop
    with intrinsics update.
    """
    h, w = image.shape[:2]
    if principal_point_centered and intrinsics is not None:
        cx, cy = int(round(intrinsics[0, 2])), int(round(intrinsics[1, 2]))
        if 0 <= cx < w and 0 <= cy < h:
            mx, my = min(cx, w - cx), min(cy, h - cy)
            if 2 * mx > resolution[0] and 2 * my > resolution[1]:
                image, depthmap, intrinsics, nearest_extras = crop_image_and_info(
                    image, (cx - mx, cy - my, cx + mx, cy + my),
                    depthmap, intrinsics, nearest_extras,
                )

    target = np.asarray(resolution)
    if aug_crop > 1 and rng is not None:
        target = target + rng.integers(0, aug_crop)
    image, depthmap, intrinsics, nearest_extras = rescale_image_and_info(
        image, target, depthmap, intrinsics, nearest_extras
    )

    new_K = camera_matrix_of_crop(
        intrinsics, (image.shape[1], image.shape[0]), resolution
    )
    bbox = bbox_from_intrinsics_in_out(intrinsics, new_K, resolution)
    image, depthmap, _, nearest_extras = crop_image_and_info(
        image, bbox, depthmap, None, nearest_extras
    )
    return image, depthmap, new_K, nearest_extras
