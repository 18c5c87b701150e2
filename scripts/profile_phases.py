"""Phase-wise real-chip timing of the bench regime (8-view 518 px inference).

Times each stage of the flagship forward separately — image encoder, info
sharing trunk, DPT dense head, pose/scale heads — as independently jitted
programs at the exact production shapes, to locate the time sink.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/profile_phases.py

Measurement notes (see bench.py): the axon tunnel acks block_until_ready
early, so every timed iteration uses a distinct input and the loop ends
with a device->host scalar fetch that drains the queue.
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def time_fn(fn, make_args, iters=8, warmup=1):
    import jax.numpy as jnp

    inputs = [make_args(i) for i in range(iters + warmup)]
    for i in range(warmup):
        out = fn(*inputs[i])
        float(jnp.sum(out[0] if isinstance(out, (tuple, list)) else out)[...].astype(jnp.float32))
    t0 = time.perf_counter()
    sums = []
    for i in range(warmup, warmup + iters):
        out = fn(*inputs[i])
        o = out[0] if isinstance(out, (tuple, list)) else out
        sums.append(jnp.sum(o.astype(jnp.float32)))
    total = float(sum(float(s) for s in sums[-1:]))
    dt = (time.perf_counter() - t0) / iters
    assert np.isfinite(total)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--views", type=int, default=8)
    ap.add_argument("--res", type=int, default=518)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--head-dtype", default="float32")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from mapanything_tpu.models.encoders.vit import ViTEncoder
    from mapanything_tpu.models.heads.dpt import DPTFeature, DPTRegressionProcessor
    from mapanything_tpu.models.heads.pose import MLPHead, PoseHead
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

    report = {}

    def record(name, dt):
        report[name] = dt
        print(f"{name:>12}: {dt * 1e3:8.1f} ms", flush=True)

    # ---- encoder ----
    enc = ViTEncoder(size="large", patch_size=P, dtype=dt_c)
    img0 = jnp.asarray(rng.randn(B * V, H, W, 3).astype(np.float32))
    p_enc = jax.jit(enc.init)(key, img0)
    enc_apply = jax.jit(lambda p, x: enc.apply(p, x))
    record("encoder", time_fn(
        enc_apply,
        lambda i: (p_enc, img0 + jnp.float32(i) * 1e-3),
        iters=args.iters,
    ))

    # ---- trunk ----
    trunk = AlternatingAttentionTransformer(
        input_embed_dim=emb, depth=24, dim=dim, num_heads=12,
        indices=(11, 17), dtype=dt_c,
    )
    feats0 = jnp.asarray(rng.randn(B, V, h, w, emb).astype(np.float32)).astype(dt_c)
    tok0 = jnp.asarray(rng.randn(B, 1, emb).astype(np.float32)).astype(dt_c)
    p_trunk = jax.jit(trunk.init)(key, feats0, tok0)
    trunk_apply = jax.jit(lambda p, x, t: trunk.apply(p, x, t))
    record("trunk", time_fn(
        trunk_apply,
        lambda i: (p_trunk, feats0 + dt_c(i * 1e-3), tok0),
        iters=args.iters,
    ))

    # ---- DPT head ----
    dptf = DPTFeature(
        hooks=(0, 1, 2, 3),
        input_feature_dims=(emb, dim, dim, dim),
        layer_dims=(96, 192, 384, 768),
        feature_dim=256,
        dtype=hdt,
    )
    dptr = DPTRegressionProcessor(output_dim=6, dtype=hdt)

    x0 = jnp.asarray(rng.randn(B * V, h, w, emb).astype(np.float32))
    xs0 = [x0] + [
        jnp.asarray(rng.randn(B * V, h, w, dim).astype(np.float32)) for _ in range(3)
    ]

    def dense_fwd(pf, pr, xs):
        return dptr.apply(pr, dptf.apply(pf, xs), (H, W))

    p_f = jax.jit(dptf.init)(key, xs0)
    p_r = jax.jit(lambda k, x: dptr.init(k, x, (H, W)))(key, jax.jit(dptf.apply)(p_f, xs0))
    dense_apply = jax.jit(dense_fwd)
    record("dpt_head", time_fn(
        dense_apply,
        lambda i: (p_f, p_r, [x + jnp.float32(i) * 1e-3 for x in xs0]),
        iters=args.iters,
    ))

    # ---- pose + scale heads ----
    pose = PoseHead(patch_size=P, num_resconv_block=2, dtype=hdt)
    p_pose = jax.jit(pose.init)(key, xs0[3])
    pose_apply = jax.jit(lambda p, x: pose.apply(p, x))
    record("pose_head", time_fn(
        pose_apply, lambda i: (p_pose, xs0[3] + jnp.float32(i) * 1e-3),
        iters=args.iters,
    ))

    total = sum(report.values())
    print(f"\n=== phase timings (B={B}, V={V}, {H}px, head_dtype={hdt}) ===")
    for k, v in report.items():
        print(f"{k:>12}: {v * 1e3:8.1f} ms  ({100 * v / total:4.1f}%)")
    print(f"{'sum':>12}: {total * 1e3:8.1f} ms -> {B * V / total:.1f} views/s upper bound")


if __name__ == "__main__":
    main()
