#!/usr/bin/env python
"""Images-only metric 3D reconstruction demo.

Parity: ``scripts/demo_images_only_inference.py`` of the reference — load a
folder of images, run feed-forward reconstruction, export a GLB/PLY point
cloud and a COLMAP sparse model.

Usage:
    python scripts/demo_images_only_inference.py --images <folder> \
        --out outputs/demo [--checkpoint <orbax dir>] [--resolution 518]
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", required=True, help="folder of input images")
    ap.add_argument("--out", default="outputs/demo")
    ap.add_argument("--checkpoint", default=None, help="orbax checkpoint dir")
    ap.add_argument("--resolution", type=int, default=518, choices=[518, 512])
    ap.add_argument("--small", action="store_true", help="use the small config")
    ap.add_argument("--conf-mask", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mapanything_tpu.models.mapanything import MapAnything, MapAnythingConfig
    from mapanything_tpu.utils.colmap import predictions_to_colmap, write_model
    from mapanything_tpu.utils.image import load_images
    from mapanything_tpu.utils.inference import PostprocessConfig, infer
    from mapanything_tpu.utils.viz import predictions_to_glb, write_ply_pointcloud

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    loaded = load_images(args.images, resolution_set=args.resolution)
    imgs = jnp.asarray(loaded["images"])[None]  # (1, V, H, W, 3)
    print(f"loaded {imgs.shape[1]} views at {imgs.shape[2]}x{imgs.shape[3]}")

    cfg = (
        MapAnythingConfig.small(compute_dtype="bfloat16")
        if args.small
        else MapAnythingConfig(compute_dtype="bfloat16")
    )
    model = MapAnything(cfg)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jax.tree.map(lambda x: x, _views_for_init(imgs))
    )
    if args.checkpoint:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        params = ckptr.restore(Path(args.checkpoint).absolute(), params)
        print(f"restored checkpoint from {args.checkpoint}")
    else:
        print("WARNING: random weights (no --checkpoint given); geometry "
              "will be meaningless but the pipeline runs end to end")

    post = PostprocessConfig(apply_confidence_mask=args.conf_mask)
    outputs = jax.block_until_ready(
        infer(model, params, jnp.asarray(loaded["images_no_norm"])[None],
              postprocess_cfg=post)
    )

    pts = np.asarray(outputs.pts3d[0])
    colors = np.asarray(outputs.img_no_norm[0])
    mask = np.asarray(outputs.mask[0, ..., 0]) if outputs.mask is not None else None

    predictions_to_glb(out / "scene.glb", pts, colors, mask)
    write_ply_pointcloud(
        out / "scene.ply",
        pts.reshape(-1, 3) if mask is None else pts[mask.astype(bool)],
        colors.reshape(-1, 3) if mask is None else colors[mask.astype(bool)],
    )
    cams, ims, p3d = predictions_to_colmap(
        pts, colors,
        np.asarray(outputs.intrinsics[0]),
        np.asarray(outputs.camera_poses[0]),
        masks=mask,
        image_names=[Path(p).name for p in loaded["paths"]],
    )
    write_model(cams, ims, p3d, out / "sparse", ".bin")

    from mapanything_tpu.utils.viewer import export_viewer_html

    export_viewer_html(
        out / "viewer.html",
        pts,
        colors,
        camera_poses=np.asarray(outputs.camera_poses[0]),
        intrinsics=np.asarray(outputs.intrinsics[0]),
        mask=mask,
        title=f"{pts.shape[0]}-view reconstruction",
    )
    print(f"wrote {out}/scene.glb, scene.ply, sparse/ (COLMAP), viewer.html")


def _views_for_init(imgs):
    from mapanything_tpu.models.mapanything import Views

    return Views(img=imgs)


if __name__ == "__main__":
    main()
