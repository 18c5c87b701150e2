#!/usr/bin/env python
"""Dense up-to-N-view benchmark CLI.

Parity: ``benchmarking/dense_n_view/benchmark.py:631`` (+ the bash driver
matrices under ``bash_scripts/benchmark/dense_n_view/``): run the flagship
model over benchmark datasets and report per-scene + overall metrics as
JSON.

Usage:
    python scripts/benchmark_dense_n_view.py \
        --dataset-expr "ETH3DWAI(ROOT=..., dataset_metadata_dir=..., \
                        split='test', num_views=8, resolution=(518, 336), \
                        covisibility_thres=0.025, seed=0)" \
        [--checkpoint <orbax dir>] [--batch-size 2] [--out results.json]
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset-expr", required=True)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--batch-size", type=int, default=2)
    ap.add_argument("--max-batches", type=int, default=None)
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--model", default="mapanything",
                    help="registry name (mapanything / mapanything_ablations)")
    ap.add_argument("--task", default="images_only",
                    help="configs/model/task preset deciding which GT "
                         "modalities feed the model")
    ap.add_argument("--out", default="outputs/dense_n_view_results.json")
    args = ap.parse_args()

    import jax

    from mapanything_tpu.benchmarking.dense_n_view import run_benchmark
    from mapanything_tpu.data.loader import get_test_data_loader
    from mapanything_tpu.models.mapanything import MapAnything, MapAnythingConfig
    from mapanything_tpu.train.loop import loss_batch_from_numpy
    from scripts.train import build_dataset

    dataset = build_dataset(args.dataset_expr)
    loader = get_test_data_loader(dataset, args.batch_size)
    loader.set_epoch(0)

    from mapanything_tpu.utils.config import load_config

    task = load_config(f"configs/model/task/{args.task}.yaml")
    keep_rays = float(task.get("ray_dirs_prob", 0)) > 0
    keep_depth = float(task.get("depth_prob", 0)) > 0
    keep_cam = float(task.get("cam_prob", 0)) > 0

    if args.model == "mapanything":
        cfg = (
            MapAnythingConfig.small(compute_dtype="bfloat16")
            if args.small
            else MapAnythingConfig(compute_dtype="bfloat16")
        )
        model = MapAnything(cfg)
    else:
        from mapanything_tpu.models.registry import init_model

        model = init_model(
            args.model, **({"size": "small"} if args.small else {})
        )

    first = next(iter(loader))
    import jax.numpy as jnp

    from mapanything_tpu.models.mapanything import Views

    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), Views(img=jnp.asarray(first["img"]))
    )
    if args.checkpoint:
        import orbax.checkpoint as ocp

        params = ocp.StandardCheckpointer().restore(
            Path(args.checkpoint).absolute(), params
        )

    results = run_benchmark(
        model, params, loader, loss_batch_from_numpy,
        max_batches=args.max_batches,
        keep_rays=keep_rays, keep_depth=keep_depth, keep_cam=keep_cam,
    )
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results.get("overall", {}), indent=2))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
