"""Benchmark harness: N-view inference throughput on the real chip.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Measures the BASELINE.json config-2 regime — 8-view 518 px images-only
metric inference (ViT-L/14 encoder + 24-layer alternating-attention trunk
+ DPT/pose/scale heads, bf16, Pallas flash attention) — in views/s/chip.

Measurement notes: the axon TPU tunnel acks block_until_ready before
execution completes, so each timed iteration uses a DISTINCT input (no
RPC dedup) and the loop ends with a device->host checksum fetch that
forces the full queue to drain.

``vs_baseline``: the reference's single-GPU design target for this regime
is real-time multi-view inference; published numbers are external
(BASELINE.md), so until the reference checkpoints are replicated on equal
hardware we report the ratio against our own round-1 measurement
(1.0 = round-1 parity).
"""

from __future__ import annotations

import json
import time

import numpy as np

# First stable measurement of this benchmark on the v5e chip (round 1,
# before kernel tuning): 15.3 views/s. vs_baseline reports the ratio
# against it until reference checkpoints can be replicated on equal
# hardware (see module docstring).
ROUND1_VIEWS_PER_S = 15.3

# v5e bf16 matmul peak (TFLOP/s) for the MFU figure; head_dim-64 attention
# can use at most ~half the 128-wide MXU contraction (docs/PERFORMANCE.md).
V5E_PEAK_TFLOPS = 197.0


def analytic_forward_flops(B, V, H, W, enc_dim=1024, enc_depth=24,
                           trunk_dim=768, trunk_depth=24, patch=14,
                           dpt_feat=256, dpt_layers=(96, 192, 384, 768)):
    """Matmul/conv FLOPs (2*M*N*K) of one flagship forward pass.

    Counts the encoder, trunk, DPT, and regressor convs; elementwise work
    and the tiny pose/scale heads are excluded (sub-1%).
    """
    h, w = H // patch, W // patch
    P = h * w

    def vit_layer(T, C):
        return 24 * T * C * C + 4 * T * T * C

    flops = 0
    # encoder: patch embed + 24 ViT-L layers on (B*V, P+1) tokens
    T = P + 1
    flops += B * V * (2 * P * enc_dim * 3 * patch * patch)
    flops += B * V * enc_depth * vit_layer(T, enc_dim)
    # trunk: proj embed + alternating layers over V*P+1 / P tokens
    Tg = V * P + 1
    flops += B * 2 * Tg * enc_dim * trunk_dim
    for layer in range(trunk_depth):
        if layer % 2 == 0:
            flops += B * vit_layer(Tg, trunk_dim)
        else:
            flops += B * V * vit_layer(P, trunk_dim)

    def conv(hh, ww, k, cin, cout):
        return 2 * B * V * hh * ww * k * k * cin * cout

    # DPT reassemble/fusion pyramid
    in_dims = (enc_dim,) + (trunk_dim,) * 3
    scales = (4, 2, 1, 0.5)
    for i, (cin, ld) in enumerate(zip(in_dims, dpt_layers)):
        flops += conv(h, w, 1, cin, ld)                  # 1x1 proj
        if scales[i] == 4:
            flops += conv(4 * h, 4 * w, 1, ld, ld)       # up4 (matmul form)
        elif scales[i] == 2:
            flops += conv(2 * h, 2 * w, 1, ld, ld)
        elif scales[i] == 0.5:
            flops += conv(h // 2, w // 2, 3, ld, ld)
        s = int(scales[i] * 2) if scales[i] >= 1 else 1
        flops += conv(int(scales[i] * h), int(scales[i] * w), 3, ld, dpt_feat)
    # refinenets: 2 res units (2 conv3x3) + out conv at 1x..8x
    for s in (1, 2, 4, 8):
        flops += 4 * conv(s * h, s * w, 3, dpt_feat, dpt_feat)
        flops += conv(2 * s * h, 2 * s * w, 1, dpt_feat, dpt_feat)
    # regressor: conv3x3 at 8x, resize, conv3x3 + 1x1 at full res
    flops += conv(8 * h, 8 * w, 3, dpt_feat, dpt_feat // 2)
    flops += conv(H, W, 3, dpt_feat // 2, dpt_feat // 2)
    flops += conv(H, W, 1, dpt_feat // 2, 6)
    return flops


def train_bench(model_cls, cfg_cls, on_tpu):
    """Train-step throughput (VERDICT r2 item 4): 4-view 518 px full step
    (production loss + AdamW) in views/s, with train MFU against the
    standard fwd+bwd = 3x forward matmul FLOPs convention (remat replay
    excluded — it is overhead, not useful work). Prints ONE JSON line.

    Measured as N steps UNROLLED inside one jit with donated state: a
    lax.scan carry forces two live params+opt copies (OOM at this shape
    under the current compiler) and a per-call loop pays ~150 ms/step of
    tunnel dispatch that vanishes on local-host TPU (see
    docs/PERFORMANCE.md "Measuring the train step").

    Round-2 baseline for ``vs_baseline``: 9.3 views/s (save_attn_mlp
    policy, docs/PERFORMANCE.md).
    """
    import jax
    import jax.numpy as jnp

    from mapanything_tpu.train.losses import LossBatch, LossConfig
    from mapanything_tpu.train.optim import OptimConfig, build_optimizer
    from mapanything_tpu.train.step import (
        TrainState,
        make_train_step,
        views_from_loss_batch,
    )

    ROUND2_TRAIN_VIEWS_PER_S = 9.3

    if on_tpu:
        B, V, H, W = 1, 4, 518, 518
        cfg = cfg_cls(
            compute_dtype="bfloat16",
            remat=True,
            remat_policy="save_attn_mlp_pre",
        )
        iters = 3
    else:
        B, V, H, W = 1, 2, 56, 56
        cfg = cfg_cls.small(remat=True)
        iters = 2

    model = model_cls(cfg)
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
    # lr tiny: several AdamW steps at production lr from a random init
    # NaN the loss (and the finiteness asserts); program structure — and
    # so the timing — is identical at any lr. mu_dtype=bf16: the
    # memory-efficient AdamW variant that lets the activation-saving remat
    # policy fit 16 GB.
    optimizer = build_optimizer(
        OptimConfig(lr=1e-7, min_lr=1e-8, epoch_len=100, total_epochs=1.0,
                    mu_dtype="bfloat16" if on_tpu else None),
        params,
    )
    state = TrainState(
        params=params,
        opt_state=optimizer.init(params),
        step=jnp.zeros((), jnp.int32),
    )
    train_step = make_train_step(model, optimizer, LossConfig(), donate=False)

    def _unrolled(state, img0):
        losses = []
        r = jax.random.PRNGKey(0)
        for i in range(iters):
            state, metrics = train_step(
                state, img0 + jnp.float32(i) * 1e-4, batch, r
            )
            r, _ = jax.random.split(r)
            losses.append(metrics["loss"])
        return state, jnp.stack(losses)

    unrolled = jax.jit(_unrolled, donate_argnums=(0,))
    state, losses = unrolled(state, img)  # compile + warmup (consumes state)
    assert np.isfinite(float(losses[-1]))
    t0 = time.perf_counter()
    state, losses = unrolled(state, img)
    final = float(losses[-1])
    dt = (time.perf_counter() - t0) / iters
    assert np.isfinite(final)

    views_per_s = B * V / dt
    record = {
        "metric": f"{V}-view {H}px full train step throughput",
        "value": round(views_per_s, 3),
        "unit": "views/s/chip",
        "vs_baseline": (
            round(views_per_s / ROUND2_TRAIN_VIEWS_PER_S, 3) if on_tpu else 1.0
        ),
    }
    if on_tpu:
        flops = 3 * analytic_forward_flops(B, V, H, W)
        record["model_tflop"] = round(flops / 1e12, 3)
        record["train_mfu"] = round(flops / dt / (V5E_PEAK_TFLOPS * 1e12), 4)
    print(json.dumps(record), flush=True)


def main():
    import jax
    import jax.numpy as jnp

    # Persistent compile cache: the 518 px 8-view program takes minutes to
    # compile over the remote-compile tunnel; cache so repeat runs are fast.
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from mapanything_tpu.models.mapanything import (
        MapAnything,
        MapAnythingConfig,
        Views,
    )

    on_tpu = jax.default_backend() not in ("cpu",)

    if on_tpu:
        B, V, H, W = 1, 8, 518, 518
        cfg = MapAnythingConfig(compute_dtype="bfloat16")
        iters = 10
    else:
        B, V, H, W = 1, 2, 56, 56
        cfg = MapAnythingConfig.small()
        iters = 2

    model = MapAnything(cfg)
    rng = np.random.RandomState(0)

    views0 = Views(img=jnp.asarray(rng.randn(B, V, H, W, 3).astype(np.float32)))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), views0)

    @jax.jit
    def fwd(params, views):
        preds = model.apply(params, views)
        checksum = jnp.sum(preds.pts3d.astype(jnp.float32)) + jnp.sum(
            preds.conf.astype(jnp.float32)
        )
        return preds, checksum

    # Distinct inputs defeat any transport-level dedup of identical calls.
    inputs = [
        Views(img=views0.img + jnp.float32(i) * 1e-3) for i in range(iters)
    ]

    preds, checksum = fwd(params, inputs[0])
    assert np.isfinite(float(checksum)), "non-finite predictions"

    t0 = time.perf_counter()
    sums = []
    for v in inputs:
        preds, checksum = fwd(params, v)
        sums.append(checksum)
    # One final fetch drains the device queue (all iterations complete).
    total_check = float(sum(float(s) for s in sums[-1:]))
    dt = (time.perf_counter() - t0) / iters
    assert np.isfinite(total_check)

    # Train-step throughput line FIRST; the inference headline stays the
    # LAST JSON line so the driver's parsed record remains comparable
    # across rounds. A wall-clock alarm bounds the cold-compile worst case
    # (~30 min over the remote-compile tunnel; warm cache is ~2 min) so a
    # compile stall can never swallow the headline below.
    import signal

    def _alarm(signum, frame):
        raise TimeoutError("train bench exceeded its time budget")

    old_handler = signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(2700)
    try:
        train_bench(MapAnything, MapAnythingConfig, on_tpu)
    except Exception as e:  # train bench must never mask the headline
        print(json.dumps({"metric": "train bench error", "error": str(e)[:200]}))
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old_handler)

    views_per_s = B * V / dt
    flops = analytic_forward_flops(B, V, H, W) if on_tpu else None
    record = {
        "metric": f"{V}-view {H}px images-only metric inference throughput",
        "value": round(views_per_s, 3),
        "unit": "views/s/chip",
        "vs_baseline": (
            round(views_per_s / ROUND1_VIEWS_PER_S, 3) if on_tpu else 1.0
        ),
    }
    if flops is not None:
        record["model_tflop"] = round(flops / 1e12, 3)
        record["mfu"] = round(flops / dt / (V5E_PEAK_TFLOPS * 1e12), 4)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
