#!/usr/bin/env python
"""MapAnything inference on a WAI-format scene.

Parity: the reference's root-level ``inference_wai.py`` [FORK] — load
frames of one WAI scene (image + optional depth / pose / intrinsics
priors), run multi-view inference with a chosen modality preset, and
export pointmaps + predictions.

Usage:
    python scripts/inference_wai.py --scene <wai_scene_dir> \
        --out outputs/wai_demo [--num-views 8] [--stride 1] \
        [--use-calib] [--use-poses] [--use-depth]
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", required=True, help="WAI scene directory")
    ap.add_argument("--out", default="outputs/wai_demo")
    ap.add_argument("--num-views", type=int, default=8)
    ap.add_argument("--stride", type=int, default=1)
    ap.add_argument("--resolution", type=int, default=518, choices=[518, 512])
    ap.add_argument("--checkpoint", default=None, help="orbax checkpoint dir")
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--use-calib", action="store_true",
                    help="feed WAI intrinsics (calibrated preset)")
    ap.add_argument("--use-poses", action="store_true",
                    help="feed WAI poses (posed preset)")
    ap.add_argument("--use-depth", action="store_true",
                    help="feed WAI depth (depth-completion preset)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mapanything_tpu.data.cropping import crop_resize_if_necessary
    from mapanything_tpu.data.wai import load_frame, load_scene_meta
    from mapanything_tpu.models.mapanything import (
        MapAnything,
        MapAnythingConfig,
    )
    from mapanything_tpu.utils.image import find_closest_aspect_ratio
    from mapanything_tpu.utils.inference import (
        PostprocessConfig,
        infer,
        preprocess_inputs_for_inference,
    )
    from mapanything_tpu.utils.viz import (
        predictions_to_glb,
        write_ply_pointcloud,
    )

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    meta = load_scene_meta(args.scene)
    names = [f["frame_name"] for f in meta["frames"]][:: args.stride]
    names = names[: args.num_views]
    mods = ["image"]
    if args.use_calib or args.use_depth:
        mods.append("intrinsics")
    if args.use_poses:
        mods.append("pose")
    if args.use_depth:
        mods.append("depth")

    imgs, Ks, poses, depths = [], [], [], []
    target = None
    for n in names:
        fr = load_frame(args.scene, n, mods, meta=meta)
        img = fr["image"]
        h0, w0 = img.shape[:2]
        if target is None:
            target = find_closest_aspect_ratio(w0 / h0, args.resolution)
        # a default centred K keeps the crop pipeline intrinsics-aware even
        # when the scene carries no calibration
        K = fr.get(
            "intrinsics",
            np.array(
                [[max(h0, w0), 0, w0 / 2], [0, max(h0, w0), h0 / 2], [0, 0, 1]],
                np.float32,
            ),
        )
        img, depth, K, _ = crop_resize_if_necessary(
            img, target, depthmap=fr.get("depth"), intrinsics=K
        )
        imgs.append(img)
        Ks.append(K)
        if depth is not None:
            depths.append(depth)
        if "pose" in fr:
            poses.append(fr["pose"])

    images = jnp.asarray(np.stack(imgs).astype(np.float32))[None]
    kwargs = {}
    if args.use_calib or args.use_depth:
        kwargs["intrinsics"] = jnp.asarray(np.stack(Ks).astype(np.float32))[None]
    if args.use_poses:
        kwargs["camera_poses"] = jnp.asarray(
            np.stack(poses).astype(np.float32)
        )[None]
    if args.use_depth:
        kwargs["depth_z"] = jnp.asarray(np.stack(depths).astype(np.float32))[None]

    V, H, W = images.shape[1], images.shape[2], images.shape[3]
    print(f"loaded {V} WAI frames at {H}x{W} "
          f"(priors: {sorted(kwargs)})")

    cfg = (
        MapAnythingConfig.small(compute_dtype="bfloat16")
        if args.small
        else MapAnythingConfig(compute_dtype="bfloat16")
    )
    model = MapAnything(cfg)
    views0 = preprocess_inputs_for_inference(images, **kwargs)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), views0)
    if args.checkpoint:
        import orbax.checkpoint as ocp

        params = ocp.StandardCheckpointer().restore(
            Path(args.checkpoint).absolute(), params
        )

    outputs = jax.device_get(
        jax.jit(
            lambda p, im: infer(
                model, p, im, postprocess_cfg=PostprocessConfig(), **kwargs
            )
        )(params, images)
    )

    pts = np.asarray(outputs.pts3d[0]).reshape(-1, 3)
    cols = (np.asarray(images[0]).reshape(-1, 3) * 255).astype(np.uint8)
    mask = np.asarray(outputs.mask[0]).reshape(-1).astype(bool)
    write_ply_pointcloud(out / "points.ply", pts[mask], cols[mask])
    predictions_to_glb(
        out / "scene.glb",
        np.asarray(outputs.pts3d[0]),
        np.asarray(images[0]),
        mask=np.asarray(outputs.mask[0]),
    )
    np.savez(
        out / "predictions.npz",
        depth_z=np.asarray(outputs.depth_z[0]),
        intrinsics=np.asarray(outputs.intrinsics[0]),
        camera_poses=np.asarray(outputs.camera_poses[0]),
        conf=np.asarray(outputs.conf[0]),
        names=names,
    )
    print(f"wrote {out}/points.ply, scene.glb, predictions.npz")


if __name__ == "__main__":
    main()
