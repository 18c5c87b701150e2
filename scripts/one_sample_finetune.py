#!/usr/bin/env python
"""One-sample finetuning: overfit a single multi-view sample ([FORK]).

Parity: ``mapanything/train/one_sample_finetune.py:44`` — the fork's
debug/capability harness that repeats one sample until the loss collapses;
used as a convergence smoke test and for single-scene adaptation.

Usage:
    python scripts/one_sample_finetune.py [--steps 200] [--lr 3e-4] [--small]
"""

from __future__ import annotations

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--views", type=int, default=2)
    ap.add_argument("--resolution", type=int, default=56)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from mapanything_tpu.models.mapanything import (
        GeometricInputConfig,
        MapAnything,
        MapAnythingConfig,
    )
    from mapanything_tpu.train.losses import LossBatch
    from mapanything_tpu.train.optim import OptimConfig, build_optimizer
    from mapanything_tpu.train.step import (
        TrainState,
        make_train_step,
        views_from_loss_batch,
    )

    B, V = 1, args.views
    H = W = args.resolution
    rng = np.random.RandomState(0)

    # A consistent synthetic sample (plane scene with valid geometry).
    K = np.array([[H, 0, W / 2 - 0.5], [0, H, H / 2 - 0.5], [0, 0, 1]], np.float32)
    depth = rng.uniform(2, 4, (B, V, H, W)).astype(np.float32)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    x_cam = (xx - K[0, 2]) * depth / K[0, 0]
    y_cam = (yy - K[1, 2]) * depth / K[1, 1]
    pts_cam = np.stack([x_cam, y_cam, depth], -1)
    dirs = pts_cam / np.linalg.norm(pts_cam, axis=-1, keepdims=True)
    d_along = np.linalg.norm(pts_cam, axis=-1, keepdims=True)

    batch = LossBatch(
        pts3d=jnp.asarray(pts_cam),
        pts3d_cam=jnp.asarray(pts_cam),
        depth_along_ray=jnp.asarray(d_along),
        ray_directions=jnp.asarray(dirs),
        camera_pose_quats=jnp.broadcast_to(jnp.asarray([0.0, 0, 0, 1]), (B, V, 4)),
        camera_pose_trans=jnp.zeros((B, V, 3)),
        valid_mask=jnp.ones((B, V, H, W), bool),
        non_ambiguous_mask=jnp.ones((B, V, H, W), bool),
        valid_non_ambiguous_mask=jnp.ones((B, V, H, W), bool),
        is_metric_scale=jnp.ones((B,), bool),
        is_synthetic=jnp.ones((B,), bool),
    )
    img = jnp.asarray(rng.randn(B, V, H, W, 3).astype(np.float32))

    cfg = MapAnythingConfig.small() if args.small else MapAnythingConfig()
    model = MapAnything(cfg)
    views = views_from_loss_batch(batch, img)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), views)["params"]

    opt = build_optimizer(
        OptimConfig(lr=args.lr, warmup_epochs=0.05, total_epochs=1.0,
                    epoch_len=args.steps),
        params,
    )
    state = TrainState(params=params, opt_state=opt.init(params),
                       step=jnp.zeros((), jnp.int32))
    step = make_train_step(
        model, opt,
        geo_cfg=GeometricInputConfig(overall_prob=0.0, dropout_prob=1.0,
                                     sparse_depth_prob=0.0),
        donate=False,
    )

    key = jax.random.PRNGKey(1)
    for i in range(args.steps):
        key, k = jax.random.split(key)
        state, metrics = step(state, img, batch, k)
        if i % 10 == 0 or i == args.steps - 1:
            print(f"step {i}: loss {float(metrics['loss']):.4f} "
                  f"grad_norm {float(metrics['grad_norm']):.3f}")

    print("final loss:", float(metrics["loss"]))


if __name__ == "__main__":
    main()
