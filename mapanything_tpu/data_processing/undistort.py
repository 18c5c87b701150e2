"""Undistortion of WAI scenes (fisheye / radial-tangential -> PINHOLE).

Parity: ``data_processing/wai_processing/scripts/undistort.py`` (:28-279):
scenes carrying ``*_distorted`` modalities with an OPENCV_FISHEYE
(k1..k4) or OPENCV (k1, k2, p1, p2[, k3]) camera model are remapped to an
ideal pinhole camera — images bilinearly, depth nearest-neighbour with -1
border (then clamped invalid to 0), masks with a 255-border + threshold —
and scene_meta is rewritten with the new PINHOLE intrinsics and the
distortion parameters removed.

This stage is pure host-side image prep (as in the reference, which runs
it on CPU workers): cv2 computes the inverse-distortion remap tables once
per camera and applies them per frame. The TPU never sees distorted
pixels.

Divergence from the reference (deliberate): after the OPENCV-model ROI
crop the principal point is shifted by the crop offset so the stored
intrinsics exactly match the cropped pixels (the reference stores the
uncropped principal point).
"""

from __future__ import annotations

import json
from copy import deepcopy
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import cv2
import numpy as np

DISTORTION_PARAM_KEYS = ["k1", "k2", "k3", "k4", "p1", "p2"]


def compute_undistort_intrinsic(
    K: np.ndarray,
    width: int,
    height: int,
    distortion_params: np.ndarray,
    center_principal_point: bool = True,
) -> np.ndarray:
    """New pinhole K for fisheye undistortion (reference :27-63)."""
    assert distortion_params.shape == (4,), "OPENCV_FISHEYE expects k1..k4"
    new_K = cv2.fisheye.estimateNewCameraMatrixForUndistortRectify(
        K.astype(np.float64),
        distortion_params.astype(np.float64),
        (int(width), int(height)),
        R=np.eye(3),
        balance=0.0,
    )
    if center_principal_point:
        new_K[0, 2] = width / 2.0
        new_K[1, 2] = height / 2.0
    return new_K.astype(np.float32)


def update_camera_meta(
    cam_meta: Dict, new_K: np.ndarray, new_width: int, new_height: int
) -> Dict:
    """PINHOLE camera dict with distortion keys dropped (reference :66-98)."""
    new_meta = deepcopy(cam_meta)
    new_meta["w"] = int(new_width)
    new_meta["h"] = int(new_height)
    new_meta["fl_x"] = float(new_K[0, 0])
    new_meta["fl_y"] = float(new_K[1, 1])
    new_meta["cx"] = float(new_K[0, 2])
    new_meta["cy"] = float(new_K[1, 2])
    new_meta["camera_model"] = "PINHOLE"
    for key in DISTORTION_PARAM_KEYS:
        new_meta.pop(key, None)
    return new_meta


def undistort_precompute(cam_meta: Dict, center_principal_point: bool = True):
    """Remap tables + new intrinsics for one camera (reference :101-149).

    Returns (new_K, new_w, new_h, map1, map2, roi); roi is None for
    fisheye (no crop) and (x, y, w, h) for the OPENCV model.
    """
    K = np.array(
        [
            [cam_meta["fl_x"], 0, cam_meta["cx"]],
            [0, cam_meta["fl_y"], cam_meta["cy"]],
            [0, 0, 1],
        ],
        np.float32,
    )
    w, h = int(cam_meta["w"]), int(cam_meta["h"])
    model = cam_meta.get("camera_model", "PINHOLE")

    if model == "OPENCV_FISHEYE":
        dist = np.array(
            [cam_meta.get(c, 0.0) for c in ["k1", "k2", "k3", "k4"]], np.float32
        )
        new_K = compute_undistort_intrinsic(
            K, w, h, dist, center_principal_point=center_principal_point
        )
        map1, map2 = cv2.fisheye.initUndistortRectifyMap(
            K, dist, np.eye(3), new_K, (w, h), cv2.CV_32FC1
        )
        return new_K, w, h, map1, map2, None
    if model == "OPENCV":
        dist = np.array(
            [cam_meta.get(c, 0.0) for c in ["k1", "k2", "p1", "p2", "k3"]],
            np.float32,
        )
        new_K, roi = cv2.getOptimalNewCameraMatrix(K, dist, (w, h), 1, (w, h))
        map1, map2 = cv2.initUndistortRectifyMap(
            K, dist, None, new_K, (w, h), cv2.CV_16SC2
        )
        x, y, new_w, new_h = roi
        # Shift the principal point into the cropped frame.
        new_K = new_K.astype(np.float32).copy()
        new_K[0, 2] -= x
        new_K[1, 2] -= y
        return new_K, new_w, new_h, map1, map2, roi
    raise NotImplementedError(f"camera model not supported: {model}")


def undistort_image(
    img: np.ndarray, map1, map2, roi: Optional[Tuple[int, int, int, int]]
) -> np.ndarray:
    """Bilinear remap with reflect border + optional ROI crop."""
    out = cv2.remap(
        img,
        map1,
        map2,
        interpolation=cv2.INTER_LINEAR,
        borderMode=cv2.BORDER_REFLECT_101,
    )
    if roi is not None:
        x, y, w, h = roi
        out = out[y : y + h, x : x + w]
    return out


def undistort_depth(
    depth: np.ndarray, map1, map2, roi: Optional[Tuple[int, int, int, int]]
) -> np.ndarray:
    """Nearest remap; out-of-source pixels become 0 (invalid depth)."""
    out = cv2.remap(
        depth.astype(np.float32),
        map1,
        map2,
        interpolation=cv2.INTER_NEAREST,
        borderMode=cv2.BORDER_CONSTANT,
        borderValue=-1,
    )
    out[out < 0] = 0.0
    if roi is not None:
        x, y, w, h = roi
        out = out[y : y + h, x : x + w]
    return out


def undistort_mask(
    mask: np.ndarray, map1, map2, roi: Optional[Tuple[int, int, int, int]]
) -> np.ndarray:
    """Binary-mask remap (reference :200-215): all-valid shortcut, else
    bilinear with a 255 border and any interpolated pixel < 255 -> 0."""
    if np.all(mask > 0):
        h, w = map1.shape[:2]
        out = np.full((h, w), 255, np.uint8)
    else:
        out = cv2.remap(
            mask.astype(np.uint8),
            map1,
            map2,
            interpolation=cv2.INTER_LINEAR,
            borderMode=cv2.BORDER_CONSTANT,
            borderValue=255,
        )
        out[out < 255] = 0
    if roi is not None:
        x, y, w, h = roi
        out = out[y : y + h, x : x + w]
    return out


def undistort_scene(
    scene_root,
    modalities: Sequence[str] = ("image_distorted", "depth_distorted"),
    center_principal_point: bool = True,
) -> List[str]:
    """Undistort every ``*_distorted`` modality of a WAI scene in place.

    Each ``foo_distorted`` frame entry is replaced by ``foo`` pointing at
    the undistorted file (images as .jpg, depth as .exr), and the camera
    parameters (shared or per-frame) become PINHOLE. Returns the list of
    processed frame names.
    """
    from mapanything_tpu.data import wai as wai_io
    from mapanything_tpu.utils.exr import write_depth_exr

    scene_root = Path(scene_root)
    meta = wai_io.load_scene_meta(scene_root)
    shared = bool(meta.get("shared_intrinsics", "fl_x" in meta))

    for m in modalities:
        if not m.endswith("_distorted"):
            raise ValueError(f"only '*_distorted' modalities supported: {m}")

    if shared:
        new_K, new_w, new_h, map1, map2, roi = undistort_precompute(
            meta, center_principal_point
        )
        for key in DISTORTION_PARAM_KEYS:
            meta.pop(key, None)
        new_cam = update_camera_meta(meta, new_K, new_w, new_h)
        meta.update(
            {
                k: new_cam[k]
                for k in ("w", "h", "fl_x", "fl_y", "cx", "cy", "camera_model")
            }
        )

    done = []
    for frame in meta["frames"]:
        if shared:
            tables = (new_K, new_w, new_h, map1, map2, roi)
        else:
            cam = dict(frame)
            cam.setdefault("camera_model", meta.get("camera_model", "PINHOLE"))
            tables = undistort_precompute(cam, center_principal_point)
            new_cam = update_camera_meta(cam, tables[0], tables[1], tables[2])
            for key in DISTORTION_PARAM_KEYS:
                frame.pop(key, None)
            frame.update(
                {
                    k: new_cam[k]
                    for k in ("w", "h", "fl_x", "fl_y", "cx", "cy", "camera_model")
                }
            )
        _, _, _, m1, m2, r = tables

        for mod in modalities:
            if mod not in frame:
                continue
            src = scene_root / frame[mod]
            base = mod.replace("_distorted", "")
            if base == "image":
                img = cv2.imread(str(src), cv2.IMREAD_COLOR)
                out = undistort_image(img, m1, m2, r)
                dst_rel = str(Path(frame[mod].replace("_distorted", "")).with_suffix(".jpg"))
                dst = scene_root / dst_rel
                dst.parent.mkdir(parents=True, exist_ok=True)
                cv2.imwrite(str(dst), out)
            elif "mask" in base:
                msk = cv2.imread(str(src), cv2.IMREAD_UNCHANGED)
                out = undistort_mask(msk, m1, m2, r)
                dst_rel = frame[mod].replace("_distorted", "")
                dst = scene_root / dst_rel
                dst.parent.mkdir(parents=True, exist_ok=True)
                cv2.imwrite(str(dst), out)
            else:  # depth and other float maps
                d = wai_io.load_depth(src)
                out = undistort_depth(d, m1, m2, r)
                dst_rel = str(Path(frame[mod].replace("_distorted", "")).with_suffix(".exr"))
                dst = scene_root / dst_rel
                dst.parent.mkdir(parents=True, exist_ok=True)
                write_depth_exr(dst, out)
            frame[base] = dst_rel
            del frame[mod]
        done.append(frame["frame_name"])

    fm = meta.get("frame_modalities", {})
    for mod in modalities:
        base = mod.replace("_distorted", "")
        if mod in fm:
            entry = fm.pop(mod)
            if isinstance(entry, dict) and "frame_key" in entry:
                entry["frame_key"] = base
            fm[base] = entry
        elif base not in fm:
            fm[base] = {
                "frame_key": base,
                "format": "image" if base == "image" else "depth",
            }
    meta["frame_modalities"] = fm

    with open(scene_root / "scene_meta.json", "w") as f:
        json.dump(meta, f, indent=2)
    return done
