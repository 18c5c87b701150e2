"""Measure the README perf table regimes on the real chip.

Three production regimes (all 518 px, ViT-L + 24-layer trunk + DPT):
  - 8-view images-only inference (same regime as bench.py);
  - 64-view inference with the chunked dense head (memory-efficient path);
  - 4-view train step (fwd + bwd + AdamW, remat on encoder+trunk).

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/bench_regimes.py [--skip ...]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip", nargs="*", default=[], choices=["infer8", "infer64", "train4"])
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--chunk", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from mapanything_tpu.models.mapanything import MapAnything, MapAnythingConfig, Views

    rng = np.random.RandomState(0)

    def run_infer(V, head_chunk, label):
        B, H, W = 1, 518, 518
        cfg = MapAnythingConfig(compute_dtype="bfloat16", head_chunk_size=head_chunk)
        model = MapAnything(cfg)
        views0 = Views(img=jnp.asarray(rng.randn(B, V, H, W, 3).astype(np.float32)))
        params = jax.jit(model.init)(jax.random.PRNGKey(0), views0)

        @jax.jit
        def fwd(params, views):
            preds = model.apply(params, views)
            return jnp.sum(preds.pts3d.astype(jnp.float32)) + jnp.sum(
                preds.conf.astype(jnp.float32)
            )

        inputs = [
            Views(img=views0.img + jnp.float32(i) * 1e-3) for i in range(args.iters + 1)
        ]
        c = fwd(params, inputs[0])
        assert np.isfinite(float(c))
        t0 = time.perf_counter()
        cs = [fwd(params, v) for v in inputs[1:]]
        assert np.isfinite(float(cs[-1]))
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{label}: {dt:.3f} s/scene -> {B * V / dt:.2f} views/s", flush=True)

    def run_train(V, label):
        from mapanything_tpu.train.losses import LossBatch
        from mapanything_tpu.train.optim import OptimConfig, build_optimizer
        from mapanything_tpu.train.step import TrainState, make_train_step

        B, H, W = 1, 518, 518
        cfg = MapAnythingConfig(compute_dtype="bfloat16", remat=True)
        model = MapAnything(cfg)

        dirs = rng.randn(B, V, H, W, 3).astype(np.float32)
        dirs[..., 2] = np.abs(dirs[..., 2]) + 0.5
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        quats = rng.randn(B, V, 4).astype(np.float32)
        quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
        img = jnp.asarray(rng.randn(B, V, H, W, 3).astype(np.float32))
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
        views0 = Views(
            img=img, ray_directions=batch.ray_directions,
            depth_along_ray=batch.depth_along_ray,
            camera_pose_quats=batch.camera_pose_quats,
            camera_pose_trans=batch.camera_pose_trans,
            is_metric_scale=jnp.ones((B, V), bool),
        )
        init_params = jax.jit(model.init)(jax.random.PRNGKey(0), views0)["params"]
        optimizer = build_optimizer(OptimConfig(epoch_len=100, total_epochs=1.0), init_params)
        state = TrainState(
            params=init_params, opt_state=optimizer.init(init_params),
            step=jnp.zeros((), jnp.int32),
        )
        # donate=True (as the Trainer does): without donation two copies of
        # params+opt_state live across the step and the 4-view 518px step
        # OOMs the 16 GB chip.
        step = make_train_step(model, optimizer, donate=True)

        state, metrics = step(state, img, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["loss"]))
        t0 = time.perf_counter()
        losses = []
        for i in range(args.iters):
            state, metrics = step(
                state, img + jnp.float32(i) * 1e-4, batch, jax.random.PRNGKey(2 + i)
            )
            losses.append(metrics["loss"])
        assert np.isfinite(float(losses[-1]))
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{label}: {dt:.3f} s/step -> {B * V / dt:.2f} views/s", flush=True)

    if "infer8" not in args.skip:
        run_infer(8, None, "infer 8-view 518px bf16")
    if "infer64" not in args.skip:
        run_infer(64, args.chunk, f"infer 64-view 518px bf16 chunk={args.chunk}")
    if "train4" not in args.skip:
        run_train(4, "train 4-view 518px bf16 remat")


if __name__ == "__main__":
    main()
