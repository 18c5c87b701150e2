#!/usr/bin/env python
"""MapAnything inference on COLMAP reconstructions.

Parity: ``scripts/demo_inference_on_colmap_outputs.py`` of the reference —
read a COLMAP model (images/ + sparse/), feed the COLMAP calibration and
poses to the model as geometric inputs, and export the reconstructed
pointmaps (GLB/PLY + depth npz).

Expected layout:
    <data>/images/*.jpg|png
    <data>/sparse/cameras.bin images.bin points3D.bin  (or .txt)

Usage:
    python scripts/demo_inference_on_colmap_outputs.py --data <folder> \
        --out outputs/colmap_demo [--no-calib] [--no-poses]
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def camera_to_K(cam) -> np.ndarray:
    """COLMAP camera -> 3x3 pinhole K (reference utils/colmap.py
    get_camera_matrix). Distortion parameters are ignored (the reference
    demo likewise assumes pinhole-compatible inputs)."""
    p = np.asarray(cam.params, np.float64)
    if cam.model in ("SIMPLE_PINHOLE", "SIMPLE_RADIAL", "RADIAL"):
        fx = fy = p[0]
        cx, cy = p[1], p[2]
    elif cam.model in ("PINHOLE", "OPENCV", "FULL_OPENCV", "OPENCV_FISHEYE"):
        fx, fy, cx, cy = p[0], p[1], p[2], p[3]
    else:
        raise ValueError(f"unsupported COLMAP camera model {cam.model}")
    return np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True, help="folder with images/ + sparse/")
    ap.add_argument("--out", default="outputs/colmap_demo")
    ap.add_argument("--ext", default=".bin", choices=[".bin", ".txt"])
    ap.add_argument("--stride", type=int, default=1, help="use every nth image")
    ap.add_argument("--resolution", type=int, default=518, choices=[518, 512])
    ap.add_argument("--checkpoint", default=None, help="orbax checkpoint dir")
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--no-calib", action="store_true",
                    help="ignore COLMAP intrinsics")
    ap.add_argument("--no-poses", action="store_true",
                    help="ignore COLMAP poses")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mapanything_tpu.models.mapanything import (
        MapAnything,
        MapAnythingConfig,
    )
    from mapanything_tpu.utils.colmap import colmap_qt_to_c2w, read_model
    from mapanything_tpu.utils.image import load_images
    from mapanything_tpu.utils.inference import (
        PostprocessConfig,
        infer,
        preprocess_inputs_for_inference,
    )
    from mapanything_tpu.utils.viz import (
        predictions_to_glb,
        write_ply_pointcloud,
    )

    data = Path(args.data)
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    cameras, images, _points = read_model(data / "sparse", ext=args.ext)
    # Deterministic order by name, strided (reference stride option).
    entries = sorted(images.values(), key=lambda im: im.name)[:: args.stride]
    paths = [data / "images" / im.name for im in entries]
    missing = [p for p in paths if not p.exists()]
    if missing:
        raise FileNotFoundError(f"missing images: {missing[:3]} ...")

    loaded = load_images(paths, resolution_set=args.resolution)
    imgs = np.asarray(loaded["images_no_norm"])[None]  # (1, V, H, W, 3)
    true_shape = np.asarray(loaded["true_shape"])  # (V, 2) original (H, W)
    V, H, W = imgs.shape[1], imgs.shape[2], imgs.shape[3]
    print(f"loaded {V} views at {H}x{W} from COLMAP model with "
          f"{len(cameras)} cameras")

    intrinsics = None
    if not args.no_calib:
        Ks = []
        for im, (h0, w0) in zip(entries, true_shape):
            K = camera_to_K(cameras[im.camera_id])
            # rescale to the bucketed resolution
            K = K * np.array(
                [[W / w0, 1, W / w0], [1, H / h0, H / h0], [1, 1, 1]],
                np.float32,
            )
            Ks.append(K)
        intrinsics = jnp.asarray(np.stack(Ks)[None])

    camera_poses = None
    if not args.no_poses:
        poses = [colmap_qt_to_c2w(im.qvec, im.tvec) for im in entries]
        camera_poses = jnp.asarray(np.stack(poses).astype(np.float32)[None])

    cfg = (
        MapAnythingConfig.small(compute_dtype="bfloat16")
        if args.small
        else MapAnythingConfig(compute_dtype="bfloat16")
    )
    model = MapAnything(cfg)
    views0 = preprocess_inputs_for_inference(
        jnp.asarray(imgs), intrinsics=intrinsics, camera_poses=camera_poses
    )
    params = jax.jit(model.init)(jax.random.PRNGKey(0), views0)
    if args.checkpoint:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        params = ckptr.restore(Path(args.checkpoint).absolute(), params)

    outputs = jax.jit(
        lambda p, im: infer(
            model,
            p,
            im,
            postprocess_cfg=PostprocessConfig(),
            intrinsics=intrinsics,
            camera_poses=camera_poses,
        )
    )(params, jnp.asarray(imgs))
    outputs = jax.device_get(outputs)

    pts = np.asarray(outputs.pts3d[0]).reshape(-1, 3)
    cols = (np.asarray(imgs[0]).reshape(-1, 3) * 255).astype(np.uint8)
    mask = np.asarray(outputs.mask[0]).reshape(-1).astype(bool)
    write_ply_pointcloud(out / "points.ply", pts[mask], cols[mask])
    predictions_to_glb(
        out / "scene.glb",
        np.asarray(outputs.pts3d[0]),
        np.asarray(imgs[0]),
        mask=np.asarray(outputs.mask[0]),
    )
    np.savez(
        out / "predictions.npz",
        depth_z=np.asarray(outputs.depth_z[0]),
        intrinsics=np.asarray(outputs.intrinsics[0]),
        camera_poses=np.asarray(outputs.camera_poses[0]),
        conf=np.asarray(outputs.conf[0]),
        names=[im.name for im in entries],
    )
    print(f"wrote {out}/points.ply, scene.glb, predictions.npz")


if __name__ == "__main__":
    main()
