#!/usr/bin/env python
"""COLMAP export demo with optional bundle-adjustment refinement.

Parity: ``scripts/demo_colmap.py`` of the reference (:372 demo_fn): run
feed-forward reconstruction on a folder of images, optionally refine with
bundle adjustment (our JAX Schur-CG solver replacing
``pycolmap.bundle_adjustment``, reference :466-485), and write a COLMAP
sparse model + PLY pointcloud.

Usage:
    python scripts/demo_colmap.py --images <folder> --out outputs/colmap \
        [--use-ba] [--checkpoint <orbax dir>] [--small]
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", required=True)
    ap.add_argument("--out", default="outputs/colmap")
    ap.add_argument("--use-ba", action="store_true")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--points-per-view", type=int, default=512)
    ap.add_argument("--ba-iters", type=int, default=10)
    ap.add_argument(
        "--tracker", default="dense", choices=["dense", "photometric"],
        help="track source: dense predictions or the keypoint tracker",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mapanything_tpu.ba.solver import ba_solve, refined_camera_poses
    from mapanything_tpu.ba.tracks import (
        extract_tracks_from_predictions,
        tracks_from_photometric_tracker,
    )
    from mapanything_tpu.models.mapanything import MapAnything, MapAnythingConfig, Views
    from mapanything_tpu.utils.colmap import predictions_to_colmap, write_model
    from mapanything_tpu.utils.image import load_images
    from mapanything_tpu.utils.inference import infer
    from mapanything_tpu.utils.viz import write_ply_pointcloud

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    loaded = load_images(args.images)
    imgs01 = jnp.asarray(loaded["images_no_norm"])[None]
    print(f"{imgs01.shape[1]} views at {imgs01.shape[2]}x{imgs01.shape[3]}")

    cfg = (
        MapAnythingConfig.small(compute_dtype="bfloat16")
        if args.small
        else MapAnythingConfig(compute_dtype="bfloat16")
    )
    model = MapAnything(cfg)
    init_views = Views(img=jnp.asarray(loaded["images"])[None])
    params = jax.jit(model.init)(jax.random.PRNGKey(0), init_views)
    if args.checkpoint:
        import orbax.checkpoint as ocp

        params = ocp.StandardCheckpointer().restore(
            Path(args.checkpoint).absolute(), params
        )

    outputs = jax.block_until_ready(infer(model, params, imgs01))

    pts3d = np.asarray(outputs.pts3d[0])
    depth_z = np.asarray(outputs.depth_z[0, ..., 0])
    K = np.asarray(outputs.intrinsics[0])
    poses = np.asarray(outputs.camera_poses[0])
    conf = np.asarray(outputs.conf[0])
    mask = (
        np.asarray(outputs.mask[0, ..., 0]).astype(bool)
        if outputs.mask is not None
        else np.ones(depth_z.shape, bool)
    )
    colors = np.asarray(outputs.img_no_norm[0])

    if args.use_ba:
        print("running bundle adjustment (Schur-CG, JAX)...")
        if args.tracker == "photometric":
            # keypoint tracks (reference VGGSfM-tracker path)
            tracks = tracks_from_photometric_tracker(
                jnp.asarray(colors), jnp.asarray(depth_z), jnp.asarray(K),
                jnp.asarray(poses), max_query_pts=args.points_per_view,
            )
        else:
            tracks = extract_tracks_from_predictions(
                jnp.asarray(pts3d), jnp.asarray(depth_z), jnp.asarray(K),
                jnp.asarray(poses), jnp.asarray(conf), jnp.asarray(mask),
                points_per_view=args.points_per_view,
            )
        state, costs = ba_solve(tracks, args.ba_iters, 25)
        n_obs = max(int(np.asarray(tracks.valid).sum()), 1)
        print(f"BA cost: {float(costs[0]):.1f} -> {float(costs[-1]):.1f} "
              f"(rms {np.sqrt(float(costs[-1]) / n_obs):.2f} px)")
        poses = np.asarray(refined_camera_poses(state))

    cams, ims, p3d = predictions_to_colmap(
        pts3d, colors, K, poses, masks=mask,
        image_names=[Path(p).name for p in loaded["paths"]],
    )
    write_model(cams, ims, p3d, out / "sparse", ".bin")
    write_ply_pointcloud(out / "points.ply", pts3d[mask], colors[mask])
    print(f"wrote {out}/sparse (COLMAP) and points.ply")


if __name__ == "__main__":
    main()
