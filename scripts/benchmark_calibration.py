#!/usr/bin/env python
"""Single-view calibration benchmark CLI (ray angular error, degrees).

Parity: ``benchmarking/calibration/benchmark.py:33,161,216-228`` (+ the
bash drivers under ``bash_scripts/benchmark/calibration/``): run the model
on single images and report per-scene + overall ray-direction angular
error.

Usage:
    python scripts/benchmark_calibration.py \
        --dataset-expr "ETH3DWAI(ROOT=..., dataset_metadata_dir=..., \
                        split='test', num_views=1, resolution=(518, 336))" \
        [--checkpoint <orbax dir>] [--out results.json]
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset-expr", required=True)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--max-batches", type=int, default=None)
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--out", default="outputs/calibration_results.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mapanything_tpu.benchmarking.calibration import run_benchmark
    from mapanything_tpu.data.loader import get_test_data_loader
    from mapanything_tpu.models.mapanything import (
        MapAnything,
        MapAnythingConfig,
        Views,
    )
    from scripts.train import build_dataset

    dataset = build_dataset(args.dataset_expr)
    loader = get_test_data_loader(dataset, args.batch_size)
    loader.set_epoch(0)

    cfg = (
        MapAnythingConfig.small(compute_dtype="bfloat16")
        if args.small
        else MapAnythingConfig(compute_dtype="bfloat16")
    )
    model = MapAnything(cfg)

    first = next(iter(loader))
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), Views(img=jnp.asarray(first["img"][:, :1]))
    )
    if args.checkpoint:
        import orbax.checkpoint as ocp

        params = ocp.StandardCheckpointer().restore(
            Path(args.checkpoint).absolute(), params
        )

    results = run_benchmark(model, params, loader, max_batches=args.max_batches)
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"overall ray angular error: {results['overall']:.3f} deg")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
