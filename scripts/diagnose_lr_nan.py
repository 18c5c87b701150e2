#!/usr/bin/env python
"""Diagnose the production-lr NaN from random init (VERDICT r3 item 6).

Round-2/3 observation: several AdamW steps at lr=1e-4 from a RANDOM init
send the loss to NaN around step ~7 on the flagship 4-view 518 px train
step, so benchmarks run at lr=1e-7. The reference never trains this way —
its recipe (train/main/*.sh) warms up from PRETRAINED encoders with a
warmup schedule — but nobody has identified WHICH term explodes.

This script runs N donated train steps at a chosen lr and prints every
loss term + grad norm + param/update norms per step, so the exploding
quantity is identifiable from the record.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/diagnose_lr_nan.py \
         [--lr 1e-4] [--steps 10] [--views 4] [--res 518] [--warmup 0]
CPU smoke: add --small (tiny config, any host).
"""

import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--views", type=int, default=4)
    ap.add_argument("--res", type=int, default=518)
    ap.add_argument("--warmup", type=int, default=0,
                    help="linear-warmup steps (0 = constant lr, the "
                         "regime that NaNs; the reference uses warmup)")
    ap.add_argument("--small", action="store_true",
                    help="tiny config for CPU smoke runs")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.small:
        from jax._src import xla_bridge

        xla_bridge._backend_factories.pop("axon", None)
        jax.config.update("jax_platforms", "cpu")
    else:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from mapanything_tpu.models.mapanything import MapAnything, MapAnythingConfig
    from mapanything_tpu.train.losses import LossBatch
    from mapanything_tpu.train.optim import OptimConfig, build_optimizer
    from mapanything_tpu.train.step import (
        TrainState,
        make_train_step,
        views_from_loss_batch,
    )

    if args.small:
        B, V, H, W = 1, 2, 56, 56
        cfg = MapAnythingConfig.small(remat=True)
    else:
        B, V, H, W = 1, args.views, args.res, args.res
        cfg = MapAnythingConfig(
            compute_dtype="bfloat16",
            remat=True,
            remat_policy="save_attn_mlp_pre",
        )
    model = MapAnything(cfg)
    rng = np.random.RandomState(0)
    dirs = rng.randn(B, V, H, W, 3).astype(np.float32)
    dirs[..., 2] = np.abs(dirs[..., 2]) + 0.5
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    quats = rng.randn(B, V, 4).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    batch = LossBatch(
        pts3d=jnp.asarray(rng.randn(B, V, H, W, 3).astype(np.float32)),
        pts3d_cam=jnp.asarray(rng.randn(B, V, H, W, 3).astype(np.float32)),
        depth_along_ray=jnp.asarray(
            rng.uniform(1, 5, (B, V, H, W, 1)).astype(np.float32)
        ),
        ray_directions=jnp.asarray(dirs),
        camera_pose_quats=jnp.asarray(quats),
        camera_pose_trans=jnp.asarray(rng.randn(B, V, 3).astype(np.float32)),
        valid_mask=jnp.ones((B, V, H, W), bool),
        non_ambiguous_mask=jnp.ones((B, V, H, W), bool),
        valid_non_ambiguous_mask=jnp.ones((B, V, H, W), bool),
        is_metric_scale=jnp.ones((B,), bool),
        is_synthetic=jnp.zeros((B,), bool),
    )
    img = jnp.asarray(rng.rand(B, V, H, W, 3).astype(np.float32))
    views = views_from_loss_batch(batch, img)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), views)["params"]
    optimizer = build_optimizer(
        OptimConfig(
            lr=args.lr,
            min_lr=args.lr * 0.1,
            warmup_epochs=(
                args.warmup / 100.0 if args.warmup else 0.0
            ),
            epoch_len=100,
            total_epochs=1.0,
            mu_dtype=None if args.small else "bfloat16",
        ),
        params,
    )
    state = TrainState(
        params=params,
        opt_state=optimizer.init(params),
        step=jnp.zeros((), jnp.int32),
    )
    base_step = make_train_step(model, optimizer, donate=True)

    def step_with_norms(state, img_in, batch_in, r):
        new_state, metrics = base_step(state, img_in, batch_in, r)
        return new_state, metrics

    # Extra norm probes computed in separate small jits (cheap next to the
    # step): max |param| and the norm of the scale/conf-sensitive heads.
    @jax.jit
    def probe(params):
        leaves = jax.tree.leaves(params)
        pn = jnp.sqrt(sum(jnp.sum(x.astype(jnp.float32) ** 2) for x in leaves))
        pmax = jnp.max(
            jnp.stack([jnp.max(jnp.abs(x.astype(jnp.float32))) for x in leaves])
        )
        return pn, pmax

    term_keys = None
    for i in range(args.steps):
        state, metrics = step_with_norms(
            state, img + jnp.float32(i) * 1e-4, batch, jax.random.PRNGKey(i)
        )
        m = {k: float(v) for k, v in metrics.items()
             if hasattr(v, "ndim") and v.ndim == 0}
        pn, pmax = probe(state.params)
        if term_keys is None:
            term_keys = sorted(m)
            print("step  " + "  ".join(f"{k:>16}" for k in term_keys)
                  + f"  {'param_norm':>12}  {'param_max':>10}", flush=True)
        print(
            f"{i:4d}  "
            + "  ".join(f"{m.get(k, float('nan')):16.4e}" for k in term_keys)
            + f"  {float(pn):12.4e}  {float(pmax):10.4e}",
            flush=True,
        )
        if not np.isfinite(m.get("loss", np.nan)):
            print(f"loss went non-finite at step {i}", flush=True)
            break


if __name__ == "__main__":
    main()
