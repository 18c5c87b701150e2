#!/usr/bin/env python
"""Data-loading throughput profiler.

Parity: ``mapanything/train/profile_dataloading.py`` /
``scripts/profile_dataloading.py`` — measure samples/s and batch latency
of a dataset + loader configuration without touching the device.

Usage:
    python scripts/profile_dataloading.py --dataset-expr "<DSL>" \
        [--images-per-batch 8] [--num-workers 8] [--max-batches 50]
"""

from __future__ import annotations

import argparse
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset-expr", required=True)
    ap.add_argument("--images-per-batch", type=int, default=8)
    ap.add_argument("--num-workers", type=int, default=8)
    ap.add_argument("--max-batches", type=int, default=50)
    args = ap.parse_args()

    from mapanything_tpu.data.loader import MultiViewDataLoader
    from mapanything_tpu.utils.timing import BlockTimer
    from scripts.train import build_dataset

    dataset = build_dataset(args.dataset_expr)
    loader = MultiViewDataLoader(
        dataset,
        images_per_batch=args.images_per_batch,
        num_workers=args.num_workers,
    )
    loader.set_epoch(0)

    timer = BlockTimer("batch")
    n_images = 0
    t_start = time.perf_counter()
    for i, batch in enumerate(loader):
        if i >= args.max_batches:
            break
        with timer:
            b, v = batch["img"].shape[:2]
            n_images += b * v
    elapsed = time.perf_counter() - t_start
    print(
        f"{n_images} images in {elapsed:.2f}s = {n_images / elapsed:.1f} images/s; "
        f"avg batch latency {timer.global_avg * 1e3:.1f} ms"
    )


if __name__ == "__main__":
    main()
