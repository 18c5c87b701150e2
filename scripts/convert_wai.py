"""CLI: convert a raw dataset to WAI, compute covisibility, aggregate.

Replaces the reference's per-dataset conversion scripts + covisibility
run + aggregate_metadata (data_processing/README.md pipeline) with one
entry point:

    python scripts/convert_wai.py --dataset blendedmvs \
        --raw-root /data/raw/blendedmvs --out-root /data/wai/blendedmvs \
        --metadata-dir /data/wai_metadata/blendedmvs \
        --covisibility --aggregate

Stages (each skippable):
  1. conversion  raw -> WAI scenes (images / EXR depth / scene_meta.json)
  2. covisibility  jitted pairwise reprojection per scene
  3. aggregate  split scene lists (+ adjacency) for the train datasets
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dataset", required=True, help="adapter name")
    ap.add_argument("--raw-root", required=True)
    ap.add_argument("--out-root", required=True)
    ap.add_argument("--metadata-dir", default=None)
    ap.add_argument("--scenes", nargs="*", default=None)
    ap.add_argument("--overwrite", action="store_true")
    ap.add_argument("--copy", action="store_true", help="copy instead of symlink")
    ap.add_argument("--covisibility", action="store_true")
    ap.add_argument("--aggregate", action="store_true")
    ap.add_argument("--adjacency", action="store_true")
    ap.add_argument("--covis-threshold", type=float, default=0.25)
    ap.add_argument("--list-datasets", action="store_true")
    args = ap.parse_args(argv)

    from mapanything_tpu.data_processing.conversion import (
        convert_scenes,
        get_adapter,
        ADAPTERS,
    )

    if args.list_datasets:
        print("\n".join(sorted(ADAPTERS)))
        return 0

    adapter = get_adapter(args.dataset)
    done = convert_scenes(
        adapter,
        args.raw_root,
        args.out_root,
        scenes=args.scenes,
        overwrite=args.overwrite,
        link_files=not args.copy,
    )
    print(f"converted {len(done)} scenes of {args.dataset}")

    if args.covisibility:
        from pathlib import Path

        import numpy as np

        from mapanything_tpu.data import wai as wai_io
        from mapanything_tpu.data_processing.covisibility import (
            compute_pairwise_covisibility,
            write_covisibility,
        )

        for scene in done:
            scene_root = Path(args.out_root) / scene
            meta = wai_io.load_scene_meta(scene_root)
            frames = meta["frames"]
            if not any("depth" in fr for fr in frames):
                continue
            depths, Ks, poses = [], [], []
            for fr in frames:
                data = wai_io.load_frame(
                    scene_root,
                    fr["frame_name"],
                    ["depth", "intrinsics", "pose"],
                    meta=meta,
                )
                depths.append(data["depth"])
                Ks.append(data["intrinsics"])
                poses.append(data["pose"])
            covis = compute_pairwise_covisibility(
                np.stack(depths), np.stack(Ks), np.stack(poses)
            )
            write_covisibility(scene_root, covis)
            print(f"covisibility: {scene} ({len(frames)} frames)")

    if args.aggregate:
        from mapanything_tpu.data_processing.aggregate import (
            aggregate_dataset_metadata,
        )

        assert args.metadata_dir, "--metadata-dir required with --aggregate"
        splits = aggregate_dataset_metadata(
            args.dataset,
            args.out_root,
            args.metadata_dir,
            threshold=args.covis_threshold,
            with_adjacency=args.adjacency,
        )
        for split, names in splits.items():
            print(f"{split}: {len(names)} scenes")
    return 0


if __name__ == "__main__":
    sys.exit(main())
