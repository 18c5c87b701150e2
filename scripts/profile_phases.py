"""In-program phase timing: each stage iterated by lax.scan inside ONE jit.

Avoids per-program dispatch overhead of the tunnel (a naive per-phase
timing loop pays a fixed multi-ms launch/ack cost per program over the
remote transport and reports inflated, unstable numbers): each phase runs
REPS times inside a single compiled program with a data dependency chaining
iterations, so per-iteration time = (t_program - t_launch) / REPS.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/profile_phases.py
"""

from __future__ import annotations

import argparse
import time

import numpy as np

REPS = 8


def timed(label, program, args, per_iter_divisor=REPS, n_timing=3):
    import jax.numpy as jnp

    out = program(*args)
    float(jnp.sum(out.astype(jnp.float32)))  # compile + warmup + drain
    t0 = time.perf_counter()
    outs = [program(*args) for _ in range(n_timing)]
    float(jnp.sum(outs[-1].astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / n_timing / per_iter_divisor
    print(f"{label:>16}: {dt * 1e3:8.1f} ms/iter", flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--views", type=int, default=8)
    ap.add_argument("--res", type=int, default=518)
    ap.add_argument("--head-dtype", default="float32")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from mapanything_tpu.models.encoders.vit import ViTEncoder
    from mapanything_tpu.models.heads.dpt import DPTFeature, DPTRegressionProcessor
    from mapanything_tpu.models.heads.pose import PoseHead
    from mapanything_tpu.models.info_sharing.alternating import (
        AlternatingAttentionTransformer,
    )

    B, V, H, W = 1, args.views, args.res, args.res
    P = 14
    h, w = H // P, W // P
    emb, dim = 1024, 768
    dt_c = jnp.bfloat16
    hdt = jnp.dtype(args.head_dtype)
    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(0)

    def scanned(apply_fn, x0, perturb):
        """Run apply_fn REPS times with a chained perturbation of the input."""

        def prog(params, x):
            def body(c, _):
                y = apply_fn(params, perturb(x, c))
                return jnp.sum(y.astype(jnp.float32)), ()

            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=REPS)
            return c

        return jax.jit(prog)

    # ---- encoder ----
    enc = ViTEncoder(size="large", patch_size=P, dtype=dt_c)
    img0 = jnp.asarray(rng.randn(B * V, H, W, 3).astype(np.float32))
    p_enc = jax.jit(enc.init)(key, img0)
    prog = scanned(
        lambda p, x: enc.apply(p, x), img0,
        lambda x, c: x + c * jnp.float32(1e-9),
    )
    timed("encoder", prog, (p_enc, img0))

    # ---- trunk ----
    trunk = AlternatingAttentionTransformer(
        input_embed_dim=emb, depth=24, dim=dim, num_heads=12,
        indices=(11, 17), dtype=dt_c,
    )
    feats0 = jnp.asarray(rng.randn(B, V, h, w, emb).astype(np.float32)).astype(dt_c)
    tok0 = jnp.asarray(rng.randn(B, 1, emb).astype(np.float32)).astype(dt_c)
    p_trunk = jax.jit(trunk.init)(key, feats0, tok0)
    prog = scanned(
        lambda p, x: trunk.apply(p, x, tok0)[0], feats0,
        lambda x, c: x + c.astype(dt_c) * dt_c(1e-9),
    )
    timed("trunk", prog, (p_trunk, feats0))

    # ---- DPT head ----
    dptf = DPTFeature(
        hooks=(0, 1, 2, 3), input_feature_dims=(emb, dim, dim, dim),
        layer_dims=(96, 192, 384, 768), feature_dim=256, dtype=hdt,
    )
    dptr = DPTRegressionProcessor(output_dim=6, dtype=hdt)
    x0 = jnp.asarray(rng.randn(B * V, h, w, emb).astype(np.float32))
    xs0 = [x0] + [
        jnp.asarray(rng.randn(B * V, h, w, dim).astype(np.float32)) for _ in range(3)
    ]
    p_f = jax.jit(dptf.init)(key, xs0)
    p_r = jax.jit(lambda k, x: dptr.init(k, x, (H, W)))(
        key, jax.jit(dptf.apply)(p_f, xs0)
    )

    def dense_prog(pf, pr, xs):
        def body(c, _):
            xs_c = [x + c * jnp.float32(1e-9) for x in xs]
            y = dptr.apply(pr, dptf.apply(pf, xs_c), (H, W))
            return jnp.sum(y.astype(jnp.float32)), ()

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=REPS)
        return c

    timed("dpt_head", jax.jit(dense_prog), (p_f, p_r, xs0))

    # ---- pose head ----
    pose = PoseHead(patch_size=P, num_resconv_block=2, dtype=hdt)
    p_pose = jax.jit(pose.init)(key, xs0[3])
    prog = scanned(
        lambda p, x: pose.apply(p, x), xs0[3],
        lambda x, c: x + c * jnp.float32(1e-9),
    )
    timed("pose_head", prog, (p_pose, xs0[3]))


if __name__ == "__main__":
    main()
