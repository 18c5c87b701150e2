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

    # Forensic companion program: same loss, same grads, but reports
    # per-top-level-subtree grad norms + prediction-magnitude probes so
    # the first NaN can be localized to a head/path (run on the state
    # BEFORE each update; ~1 extra fwd+bwd per step).
    from mapanything_tpu.train.losses import factored_geometry_scale_loss
    from mapanything_tpu.train.losses import LossConfig

    loss_cfg = LossConfig()

    from mapanything_tpu.models.mapanything import (
        GeometricInputConfig,
        sample_modality_masks,
    )

    geo_cfg = GeometricInputConfig()

    @jax.jit
    def forensic(params, img_in, batch_in, r):
        # Mirror make_train_step's stochastic forward exactly (same rng
        # splits -> same modality masks / PE indices as the real step).
        B, V = batch_in.valid_mask.shape[:2]
        H_, W_ = batch_in.valid_mask.shape[2:]
        rng_masks, rng_pe = jax.random.split(r)
        masks = sample_modality_masks(rng_masks, B, V, (H_, W_), geo_cfg)
        pe_indices = None
        if (
            model.config.use_pe_for_non_reference_views
            and model.config.use_rand_idx_pe_for_non_reference_views
            and V > 1
        ):
            pe_indices = jax.random.randint(
                rng_pe, (V - 1,), 1, model.config.max_num_views_for_pe
            )

        def loss_fn(p):
            v = views_from_loss_batch(batch_in, img_in)
            preds = model.apply(
                {"params": p}, v, masks, deterministic=True,
                non_ref_view_pe_indices=pe_indices,
            )
            loss, _ = factored_geometry_scale_loss(batch_in, preds, loss_cfg)
            return loss * 2.0 / batch_in.valid_mask.shape[1], preds

        (loss, preds), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)

        # Where is the NaN born? Differentiate the LOSS ALONE wrt the
        # predictions: if these cotangents are already non-finite, the
        # loss backward is the source; if they are finite while the param
        # grads are NaN, the model backward is.
        def loss_of_preds(pr):
            loss2, _ = factored_geometry_scale_loss(batch_in, pr, loss_cfg)
            return loss2 * 2.0 / batch_in.valid_mask.shape[1]

        dpreds = jax.grad(loss_of_preds, allow_int=True)(preds)
        out = {}
        for name in ("depth_along_ray", "conf", "metric_scaling_factor",
                     "pts3d_cam", "pts3d", "cam_trans"):
            val = getattr(dpreds, name, None)
            if val is not None:
                out[f"dL/d{name}"] = jnp.max(jnp.abs(val.astype(jnp.float32)))
        for key, sub in grads.items():
            sq = sum(jnp.sum(jnp.square(x.astype(jnp.float32)))
                     for x in jax.tree.leaves(sub))
            out[f"g/{key}"] = jnp.sqrt(sq)
        for name in ("depth_along_ray", "conf", "metric_scaling_factor",
                     "pts3d_cam", "cam_trans"):
            val = getattr(preds, name, None)
            if val is not None:
                out[f"max|{name}|"] = jnp.max(jnp.abs(val.astype(jnp.float32)))
        return out

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
        fz = {k: float(v) for k, v in forensic(
            state.params, img + jnp.float32(i) * 1e-4, batch,
            jax.random.PRNGKey(i)).items()}
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
        print("      forensic: " + "  ".join(
            f"{k}={v:.3e}" for k, v in sorted(fz.items())), flush=True)
        if not np.isfinite(m.get("loss", np.nan)):
            print(f"loss went non-finite at step {i}", flush=True)
            break


if __name__ == "__main__":
    main()
