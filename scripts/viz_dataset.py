#!/usr/bin/env python
"""Dataloader visual-verification harness for WAI datasets.

Parity: the reference's per-dataset ``__main__`` viz harnesses
(``datasets/wai/eth3d.py:149`` and siblings; documented as the
recommended dataloader check in ``benchmarking/dense_n_view/README.md``
and ``train.md``). Loads multi-view sets through the full dataset
pipeline (covisibility random walk, crop/resize, view-dict construction)
and exports what the model would see: an image grid plus an interactive
WebGL point-cloud viewer built from the GT depth/poses.

Usage:
    python scripts/viz_dataset.py --dataset eth3d --root <wai_root> \
        --metadata <metadata_dir> --out outputs/viz [--num-views 4] \
        [--num-sets 2] [--viz]
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", required=True,
                    help="dataset key, e.g. eth3d, scannetppv2, tav2_wb")
    ap.add_argument("--root", required=True, help="WAI dataset root")
    ap.add_argument("--metadata", required=True, help="scene-list .npy dir")
    ap.add_argument("--split", default=None)
    ap.add_argument("--out", default="outputs/viz_dataset")
    ap.add_argument("--num-views", type=int, default=4)
    ap.add_argument("--num-sets", type=int, default=2)
    ap.add_argument("--resolution", type=int, nargs=2, default=(518, 392))
    ap.add_argument("--covis-thres", type=float, default=0.25)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from mapanything_tpu.data.datasets import wai_datasets
    from mapanything_tpu.utils.viewer import export_viewer_html
    from mapanything_tpu.utils.viz import save_views_as_image
    from mapanything_tpu.geometry.camera import depthmap_to_world_frame

    registry = {
        name.lower().replace("wai", ""): cls
        for name, cls in vars(wai_datasets).items()
        if isinstance(cls, type)
        and issubclass(cls, wai_datasets.WAIDataset)
        and cls is not wai_datasets.WAIDataset
    }
    key = args.dataset.lower().replace("wai", "").replace("_", "")
    matches = [k for k in registry if k.replace("_", "") == key]
    if not matches:
        raise SystemExit(
            f"unknown dataset '{args.dataset}'; available: {sorted(registry)}"
        )
    cls = registry[matches[0]]

    ds = cls(
        num_views=args.num_views,
        split=args.split,
        covisibility_thres=args.covis_thres,
        resolution=tuple(args.resolution),
        seed=args.seed,
        ROOT=args.root,
        dataset_metadata_dir=args.metadata,
    )
    print(f"{type(ds).__name__}: {len(ds)} sets")

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    for s in range(args.num_sets):
        views = ds[s]
        imgs = np.stack([np.asarray(v["img_no_norm"]) for v in views])
        save_views_as_image(imgs, out / f"set{s}_views.png")

        pts_all, col_all, poses = [], [], []
        for v in views:
            # the pipeline precomputes pts3d + valid_mask; fall back to
            # unprojecting depth for datasets without cached pointmaps
            if "pts3d" in v:
                pts = np.asarray(v["pts3d"])
                m = np.asarray(v["valid_mask"]).astype(bool)
            else:
                depth = np.asarray(v["depthmap"]).squeeze()
                pts_j, valid = depthmap_to_world_frame(
                    depth[None],
                    np.asarray(v["camera_intrinsics"])[None],
                    np.asarray(v["camera_pose"])[None],
                )
                pts = np.asarray(pts_j[0])
                m = np.asarray(valid[0]).astype(bool) & (depth > 0)
            pts_all.append(pts[m])
            col_all.append(np.asarray(v["img_no_norm"])[m])
            poses.append(np.asarray(v["camera_pose"]))
        export_viewer_html(
            out / f"set{s}_scene.html",
            np.concatenate(pts_all),
            np.concatenate(col_all),
            camera_poses=poses,
            title=f"{type(ds).__name__} set {s}",
        )
        print(f"set {s}: {sum(len(p) for p in pts_all)} points, "
              f"{len(views)} views -> set{s}_scene.html")


if __name__ == "__main__":
    main()
