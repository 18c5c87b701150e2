"""Offline WAI processing stages beyond conversion: undistortion,
depth-consistency confidence, pseudo-depth (MoGe / plane-sweep MVS) and
mesh rendering.

Mirrors the reference's per-stage driver scripts
(``data_processing/wai_processing/scripts/{undistort,
depth_consistency_confidence, run_moge, run_mvsanywhere,
run_rendering}.py``) behind one CLI:

    python scripts/process_wai.py undistort      --root /data/wai/ase
    python scripts/process_wai.py confidence     --root /data/wai/eth3d
    python scripts/process_wai.py moge           --root /data/wai/megadepth
    python scripts/process_wai.py mvs            --root /data/wai/dl3dv
    python scripts/process_wai.py render         --root /data/wai/scannetpp

Scenes are subdirectories of --root containing scene_meta.json; failures
are recorded per scene and skipped (the reference's set_processing_state
pattern).
"""

from __future__ import annotations

import argparse
import sys
import traceback
from pathlib import Path


def iter_scenes(root: Path, scenes):
    if scenes:
        return [root / s for s in scenes]
    return sorted(
        p.parent for p in root.glob("*/scene_meta.json")
    )


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "stage",
        choices=["undistort", "confidence", "moge", "mvs", "render"],
    )
    ap.add_argument("--root", required=True, help="WAI dataset root")
    ap.add_argument("--scenes", nargs="*", help="scene names (default: all)")
    ap.add_argument("--num-planes", type=int, default=64)
    ap.add_argument("--num-neighbors", type=int, default=4)
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--mesh-name", default="mesh")
    ap.add_argument(
        "--modalities",
        nargs="*",
        default=None,
        help="undistort: '*_distorted' keys; render: rendered_* keys",
    )
    ap.add_argument("--moge-checkpoint", help="converted MoGe param dir")
    args = ap.parse_args(argv)

    root = Path(args.root)
    ok, failed = 0, 0
    for scene_root in iter_scenes(root, args.scenes):
        try:
            if args.stage == "undistort":
                from mapanything_tpu.data_processing.undistort import (
                    undistort_scene,
                )

                mods = tuple(
                    args.modalities or ("image_distorted", "depth_distorted")
                )
                undistort_scene(scene_root, modalities=mods)
            elif args.stage == "confidence":
                import numpy as np

                from mapanything_tpu.data import wai as wai_io
                from mapanything_tpu.data_processing.depth_confidence import (
                    compute_depth_consistency_confidence,
                    write_depth_confidence,
                )

                meta = wai_io.load_scene_meta(scene_root)
                names, depths, Ks, poses = [], [], [], []
                for fr in meta["frames"]:
                    data = wai_io.load_frame(
                        scene_root,
                        fr["frame_name"],
                        ["depth", "intrinsics", "pose"],
                        meta=meta,
                    )
                    names.append(fr["frame_name"])
                    depths.append(data["depth"])
                    Ks.append(data["intrinsics"])
                    poses.append(data["pose"])
                conf = compute_depth_consistency_confidence(
                    np.stack(depths), np.stack(Ks), np.stack(poses)
                )
                write_depth_confidence(scene_root, names, conf)
            elif args.stage == "moge":
                from mapanything_tpu.data_processing.pseudo_depth import (
                    run_moge_on_scene,
                )

                params = None
                if args.moge_checkpoint:
                    import orbax.checkpoint as ocp

                    params = ocp.StandardCheckpointer().restore(
                        str(Path(args.moge_checkpoint).absolute())
                    )
                run_moge_on_scene(
                    scene_root, params=params, batch_size=args.batch_size
                )
            elif args.stage == "mvs":
                from mapanything_tpu.data_processing.pseudo_depth import (
                    run_mvs_on_scene,
                )

                run_mvs_on_scene(
                    scene_root,
                    num_neighbors=args.num_neighbors,
                    num_planes=args.num_planes,
                )
            elif args.stage == "render":
                from mapanything_tpu.data_processing.rendering import (
                    render_scene_frames,
                )

                mods = tuple(args.modalities or ("rendered_depth",))
                render_scene_frames(
                    scene_root, mesh_name=args.mesh_name, modalities=mods
                )
            ok += 1
            print(f"[{args.stage}] {scene_root.name}: ok")
        except Exception:
            failed += 1
            print(f"[{args.stage}] {scene_root.name}: FAILED", file=sys.stderr)
            traceback.print_exc()
    print(f"{args.stage}: {ok} scenes processed, {failed} failed")
    return 1 if failed and not ok else 0


if __name__ == "__main__":
    raise SystemExit(main())
