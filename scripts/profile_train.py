#!/usr/bin/env python
"""Profile the training step phase-by-phase on the real chip.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/profile_train.py
     [--views 4] [--res 518] [--no-remat] [--save-policy POLICY]

Times (scanned multi-iteration programs with distinct inputs + final
checksum fetch — see scripts/profile_phases.py for why):
  - forward-only (loss value)
  - forward+backward (grads)
  - full train step (grads + optimizer update)
"""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--views", type=int, default=4)
    ap.add_argument("--res", type=int, default=518)
    ap.add_argument("--no-remat", action="store_true")
    _POLICIES = ["dots", "dots_saveable", "save_attn", "save_attn_mlp",
                 "save_attn_mlp_pre", "save_attn_mlp_pre_offload_qkv",
                 "save_qkv_attn_mlp", "save_qkv_attn_mlp_offload"]
    ap.add_argument("--remat-policy", default=None, choices=_POLICIES,
                    help="global remat save policy (default: save nothing)")
    ap.add_argument("--encoder-remat-policy", default=None,
                    choices=_POLICIES + ["nothing"],
                    help="encoder override; 'nothing' = full recompute for "
                         "the encoder while a global --remat-policy is set")
    ap.add_argument("--trunk-remat-policy", default=None,
                    choices=_POLICIES + ["nothing"],
                    help="trunk override; 'nothing' = full recompute for "
                         "the trunk while a global --remat-policy is set")
    ap.add_argument("--no-encoder-remat", action="store_true")
    ap.add_argument("--no-trunk-remat", action="store_true")
    ap.add_argument("--head-dtype", default="float32")
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--phases", default="fwd,bwd,full")
    ap.add_argument("--mu-dtype", default=None,
                    choices=["bfloat16", "float32"],
                    help="Adam first-moment dtype (bfloat16 frees ~650 MB "
                         "HBM on the flagship)")
    ap.add_argument("--nu-dtype", default=None,
                    choices=["bfloat16", "float32"],
                    help="Adam second-moment dtype (bfloat16 frees another "
                         "~850 MB; see train/optim.py precision note)")
    ap.add_argument("--no-opt-state", action="store_true",
                    help="skip building optimizer state (fwd/bwd phases "
                         "only): measures the backward on a pristine chip "
                         "with no optimizer buffers resident — NOT the "
                         "production-resident set; for OOM probes")
    ap.add_argument("--unroll", type=int, default=0,
                    help="time the full phase as N train steps UNROLLED "
                         "in one jit (no scan carry, no per-call "
                         "dispatch); the most faithful amortized number")
    ap.add_argument("--no-scan", action="store_true",
                    help="time the full phase as sequential train_step "
                         "calls (distinct inputs + final fetch) instead of "
                         "a lax.scan program — the scan carry forces the "
                         "compiler to keep TWO copies of params+opt state "
                         "alive (observed +3.3 GB -> OOM), which the "
                         "production loop (donated single step) never does")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from mapanything_tpu.models.mapanything import (
        MapAnything,
        MapAnythingConfig,
    )
    from mapanything_tpu.train.losses import LossBatch, LossConfig
    from mapanything_tpu.train.losses import factored_geometry_scale_loss
    from mapanything_tpu.train.optim import OptimConfig, build_optimizer
    from mapanything_tpu.train.step import (
        TrainState,
        make_train_step,
        views_from_loss_batch,
    )

    B, V, H, W = 1, args.views, args.res, args.res
    cfg = MapAnythingConfig(
        compute_dtype="bfloat16",
        head_dtype=args.head_dtype,
        remat=not args.no_remat,
        encoder_remat=False if args.no_encoder_remat else None,
        trunk_remat=False if args.no_trunk_remat else None,
        remat_policy=args.remat_policy,
        encoder_remat_policy=args.encoder_remat_policy,
        trunk_remat_policy=args.trunk_remat_policy,
    )
    model = MapAnything(cfg)
    rng = np.random.RandomState(0)

    img = jnp.asarray(rng.rand(B, V, H, W, 3).astype(np.float32))
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
    views = views_from_loss_batch(batch, img)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), views)["params"]
    # lr tiny: N real AdamW steps at production lr from a random init sends
    # the loss to NaN around step ~7, tripping the finiteness asserts; the
    # program structure (and so the timing) is identical at any lr.
    opt_cfg = OptimConfig(lr=1e-7, min_lr=1e-8, epoch_len=100,
                          total_epochs=1.0, mu_dtype=args.mu_dtype,
                          nu_dtype=args.nu_dtype)
    optimizer = build_optimizer(opt_cfg, params)
    if args.no_opt_state:
        assert not ({"opt", "full"} & set(args.phases.split(","))), (
            "--no-opt-state only valid for fwd/bwd phases"
        )
        state = None
    else:
        state = TrainState(
            params=params, opt_state=optimizer.init(params),
            step=jnp.zeros((), jnp.int32),
        )
    loss_cfg = LossConfig()

    def loss_fn(params, img_in):
        v = views_from_loss_batch(batch, img_in)
        preds = model.apply({"params": params}, v)
        loss, _ = factored_geometry_scale_loss(batch, preds, loss_cfg)
        return loss * 2.0 / V

    REPS = args.reps

    def scanned(fn):
        @jax.jit
        def prog(params, img0):
            def body(c, i):
                out = fn(params, img0 + i.astype(jnp.float32) * 1e-4)
                return c + out, None

            tot, _ = jax.lax.scan(
                body, jnp.zeros((), jnp.float32), jnp.arange(REPS)
            )
            return tot

        return prog

    def timed(label, prog, arg_sets):
        out = prog(*arg_sets)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = prog(*arg_sets)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / REPS
        print(f"{label:>16}: {dt*1e3:8.1f} ms/iter  ({B*V/dt:.2f} views/s)",
              flush=True)
        return dt

    phases = set(args.phases.split(","))
    if "fwd" in phases:
        fwd = scanned(lambda p, im: loss_fn(p, im))
        timed("forward(loss)", fwd, (params, img))

    if "bwd" in phases:
        def gradsum(p, im):
            g = jax.grad(loss_fn)(p, im)
            return sum(
                jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(g)
            )

        bwd = scanned(gradsum)
        timed("forward+grad", bwd, (params, img))

    if "opt" in phases:
        # Optimizer update alone (clip + adam + wd + lr + apply), donated.
        import optax

        def opt_step(params, opt_state, grads):
            updates, new_opt = optimizer.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), new_opt

        opt_jit = jax.jit(opt_step, donate_argnums=(0, 1))
        grads = jax.tree.map(jnp.ones_like, state.params)
        # Donate COPIES: state.params/opt_state must stay alive for any
        # later phase in the --phases list (e.g. --phases opt,full).
        p, o = opt_jit(
            jax.tree.map(jnp.copy, state.params),
            jax.tree.map(jnp.copy, state.opt_state),
            grads,
        )
        jax.block_until_ready(p)
        t0 = time.perf_counter()
        for _ in range(REPS):
            p, o = opt_jit(p, o, grads)
        jax.block_until_ready(jax.tree.leaves(p)[0])
        dt = (time.perf_counter() - t0) / REPS
        print(f"{'optimizer':>16}: {dt*1e3:8.1f} ms/iter")

    if "full" not in phases:
        return
    if args.unroll:
        # N train steps UNROLLED inside one jit: no scan carry (whose
        # buffer aliasing the compiler breaks with copies around pallas
        # custom-calls -> +3.9 GB OOM) and no per-call dispatch overhead
        # (the donated per-call loop serializes on the tunnel). Python-
        # level unrolling lets XLA reuse buffers by liveness alone.
        N = args.unroll
        train_step_inner = make_train_step(
            model, optimizer, loss_cfg, donate=False
        )

        def _unrolled(state, img0):
            losses = []
            r = jax.random.PRNGKey(0)
            for i in range(N):
                st2, metrics = train_step_inner(
                    state, img0 + jnp.float32(i) * 1e-4, batch, r
                )
                r, _ = jax.random.split(r)
                state = st2
                losses.append(metrics["loss"])
            return state, jnp.stack(losses)

        # donate the incoming state so only ONE params+opt copy is live.
        unrolled = jax.jit(_unrolled, donate_argnums=(0,))
        state, losses = unrolled(state, img)
        jax.block_until_ready(losses)
        t0 = time.perf_counter()
        state2, losses = unrolled(state, img)
        final = float(losses[-1]) + float(
            jnp.sum(state2.params["scale_token"].astype(jnp.float32))
        )
        dt = (time.perf_counter() - t0) / N
        assert np.isfinite(final)
        print(f"{'full step':>16}: {dt*1e3:8.1f} ms/iter  "
              f"({B*V/dt:.2f} views/s)  [unroll={N}]")
        return
    if args.no_scan:
        # Production-shaped measurement: one donated train step per call,
        # distinct inputs, final loss fetch drains the queue.
        train_step = make_train_step(model, optimizer, loss_cfg, donate=True)
        state, metrics = train_step(state, img, batch, jax.random.PRNGKey(0))
        assert np.isfinite(float(metrics["loss"]))
        t0 = time.perf_counter()
        last = None
        for i in range(REPS):
            state, metrics = train_step(
                state, img + jnp.float32(i + 1) * 1e-4, batch,
                jax.random.PRNGKey(i),
            )
            last = metrics["loss"]
        assert np.isfinite(float(last))
        dt = (time.perf_counter() - t0) / REPS
        print(f"{'full step':>16}: {dt*1e3:8.1f} ms/iter  "
              f"({B*V/dt:.2f} views/s)  [no-scan, donated]")
        return
    train_step = make_train_step(model, optimizer, loss_cfg, donate=False)

    @jax.jit
    def full(state, img0):
        def body(c, i):
            st, r = c
            st2, metrics = train_step(
                st, img0 + i.astype(jnp.float32) * 1e-4, batch, r
            )
            r2, _ = jax.random.split(r)
            return (st2, r2), metrics["loss"]

        (st, _), losses = jax.lax.scan(
            body, (state, jax.random.PRNGKey(0)), jnp.arange(REPS)
        )
        return jnp.sum(losses) + jnp.sum(
            st.params["scale_token"].astype(jnp.float32)
        )

    out = full(state, img)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = full(state, img)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / REPS
    print(f"{'full step':>16}: {dt*1e3:8.1f} ms/iter  ({B*V/dt:.2f} views/s)")


if __name__ == "__main__":
    main()
