"""Benchmark harness: N-view inference + train-step throughput on the real chip.

Prints one JSON line per regime; the LAST line is the headline record the
driver parses ({"metric": ..., "value": N, "unit": ..., "vs_baseline": N}).

Lines, in print order:
  1. 64-view 518 px memory-efficient inference (the many-view regime that
     motivates the context-parallel design; reference counterpart is the
     memory-efficient inference path, ``model.py:1440-1618``).
  2. 4-view 518 px full train step (production loss + AdamW), measured via
     the additive decomposition (see ``train_bench``).
  3. HEADLINE: 8-view 518 px images-only metric inference (BASELINE.json
     config 2) — ViT-L/14 encoder + 24-layer alternating-attention trunk
     + DPT/pose/scale heads, bf16, Pallas flash attention — views/s/chip.

Measurement notes: the axon TPU tunnel acks block_until_ready before
execution completes, so each timed iteration uses a DISTINCT input (no
RPC dedup) and the loop ends with a device->host checksum fetch that
forces the full queue to drain.

Baseline anchors (every record carries ``baseline_anchor`` saying exactly
what its ``vs_baseline`` ratio is against): the reference's published
numbers are external and its checkpoints are env-gated (no network), so
inference is anchored to OUR round-1 first stable measurement and train to
OUR round-2 first measurement. 1.0 = parity with that first run; nothing
here is a reference-hardware comparison yet (BASELINE.json wiring exists
for the day real checkpoints land).
"""

from __future__ import annotations

import json
import os
import signal
import time

import numpy as np

# First stable measurement of the headline benchmark on the v5e chip
# (round 1, before kernel tuning): 15.3 views/s.
ROUND1_VIEWS_PER_S = 15.3
INFER_ANCHOR = "vs our round-1 first stable run (15.3 views/s); reference checkpoints env-gated"

# First train-step measurement (round 2, save_attn_mlp policy): 9.3 views/s.
ROUND2_TRAIN_VIEWS_PER_S = 9.3
TRAIN_ANCHOR = "vs our round-2 first measurement (9.3 views/s); reference trains on 80GB parts"

# First driver-recorded many-view measurement (round 4): 14.58 views/s.
ROUND4_MANYVIEW_VIEWS_PER_S = 14.58
MANYVIEW_ANCHOR = (
    "vs the round-4 first driver-recorded many-view run (14.58 views/s); "
    "single chip, chunked dense head"
)

# Key naming: ``vs_round1`` / ``vs_round2`` / ``vs_round4`` say exactly
# what each ratio measures (our own first recorded runs). ``vs_baseline``
# is kept as an alias carrying the same value because the driver parses
# that key from the last line ({"metric", "value", "unit", "vs_baseline"}).

# v5e bf16 matmul peak (TFLOP/s) for the MFU figure; head_dim-64 attention
# can use at most ~half the 128-wide MXU contraction (docs/PERFORMANCE.md
# "Inference roofline").
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
    # refinenets (4 levels at h/2, h, 2h, 4h — the 8x map only exists
    # AFTER the last fusion resize; an earlier version of this model
    # charged a phantom 4-conv stage at 8h and overstated the forward by
    # 3.7 TFLOP / MFU by 0.10):
    # refinenet4 (no skip): one res unit (2 conv3x3) at h/2 + out 1x1 at h
    flops += 2 * conv(h // 2, w // 2, 3, dpt_feat, dpt_feat)
    flops += conv(h, w, 1, dpt_feat, dpt_feat)
    # refinenet3..1: 2 res units (4 conv3x3) at s*h + out 1x1 at 2s*h
    for s in (1, 2, 4):
        flops += 4 * conv(s * h, s * w, 3, dpt_feat, dpt_feat)
        flops += conv(2 * s * h, 2 * s * w, 1, dpt_feat, dpt_feat)
    # regressor: conv3x3 at 8x, resize, conv3x3 + 1x1 at full res
    flops += conv(8 * h, 8 * w, 3, dpt_feat, dpt_feat // 2)
    flops += conv(H, W, 3, dpt_feat // 2, dpt_feat // 2)
    flops += conv(H, W, 1, dpt_feat // 2, 6)
    return flops


def _make_loss_batch(B, V, H, W, seed=0):
    import jax.numpy as jnp

    from mapanything_tpu.train.losses import LossBatch

    rng = np.random.RandomState(seed)
    dirs = rng.randn(B, V, H, W, 3).astype(np.float32)
    dirs[..., 2] = np.abs(dirs[..., 2]) + 0.5
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    quats = rng.randn(B, V, 4).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    return LossBatch(
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


def train_bench(model_cls, cfg_cls, on_tpu):
    """Train-step throughput: 4-view 518 px full step (production loss +
    AdamW) in views/s, with train MFU against the standard fwd+bwd = 3x
    forward matmul FLOPs convention (remat replay excluded — it is
    overhead, not useful work). Prints ONE JSON line.

    Measured via the ADDITIVE DECOMPOSITION docs/PERFORMANCE.md declares
    honest for this transport: a scanned forward+grad program whose scan
    carry is a SCALAR (so it compiles and pipelines — a full-state scan
    carry double-buffers params+opt and OOMs under the current compiler,
    and an unrolled-N jit sits at the HBM ceiling with degraded
    scheduling; both verified on the chip), plus the donated AdamW update
    timed alone, summed. The production loop (donated single step per
    batch) has exactly these two costs and no others on local-host TPU;
    only the axon tunnel's fixed dispatch is excluded (~8 ms per scanned
    call, amortized by reps; ~150 ms for blocking per-call loops).
    """
    import jax
    import jax.numpy as jnp

    from mapanything_tpu.train.losses import (
        LossConfig,
        factored_geometry_scale_loss,
    )
    from mapanything_tpu.train.optim import OptimConfig, build_optimizer
    from mapanything_tpu.train.step import views_from_loss_batch

    if on_tpu:
        B, V, H, W = 1, 4, 518, 518
        cfg = cfg_cls(
            compute_dtype="bfloat16",
            remat=True,
            remat_policy="save_attn_mlp_pre",
        )
        # A scanned program pays one fixed dispatch per call (measured
        # ~8 ms by comparing reps=4 vs reps=16: 418.5 vs 412.5 ms/iter);
        # reps=10 amortizes it to ~1 ms/iter.
        reps = 10
    else:
        B, V, H, W = 1, 2, 56, 56
        cfg = cfg_cls.small(remat=True)
        reps = 2

    model = model_cls(cfg)
    rng = np.random.RandomState(0)
    batch = _make_loss_batch(B, V, H, W)
    img = jnp.asarray(rng.rand(B, V, H, W, 3).astype(np.float32))
    views = views_from_loss_batch(batch, img)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), views)["params"]
    loss_cfg = LossConfig()

    def loss_fn(p, img_in):
        v = views_from_loss_batch(batch, img_in)
        preds = model.apply({"params": p}, v)
        loss, _ = factored_geometry_scale_loss(batch, preds, loss_cfg)
        return loss * 2.0 / V

    # Measurement order is load-bearing (measured on the v5e): the
    # fwd+grad program sits near the 16 GB HBM ceiling, and the ~8 ms
    # optimizer update reads ~30 ms in any process where that program has
    # already executed (even after jax.clear_caches) — so the small
    # program is measured FIRST on a pristine chip, its buffers freed,
    # then the big one.

    # Part 1: the donated AdamW update alone (clip + adam + wd + apply).
    # lr tiny: several AdamW steps at production lr from a RANDOM init NaN
    # the loss (docs/PERFORMANCE.md "Production-lr stability" — the
    # reference's recipe also never does this: it warms up from pretrained
    # encoders). Program structure — and so the timing — is identical at
    # any lr. mu_dtype=bf16: the memory-efficient AdamW variant that lets
    # the activation-saving remat policy fit 16 GB.
    import optax

    optimizer = build_optimizer(
        OptimConfig(lr=1e-7, min_lr=1e-8, epoch_len=100, total_epochs=1.0,
                    mu_dtype="bfloat16" if on_tpu else None),
        params,
    )
    opt_state = optimizer.init(params)

    def opt_step(p, o, grads):
        updates, new_o = optimizer.update(grads, o, p)
        return optax.apply_updates(p, updates), new_o

    opt_jit = jax.jit(opt_step, donate_argnums=(0, 1))
    grads = jax.tree.map(jnp.ones_like, params)
    # Donate COPIES so `params` stays alive for the fwd+grad measurement.
    p, o = opt_jit(jax.tree.map(jnp.copy, params), opt_state, grads)
    jax.block_until_ready(jax.tree.leaves(p)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        p, o = opt_jit(p, o, grads)
    jax.block_until_ready(jax.tree.leaves(p)[0])
    opt_dt = (time.perf_counter() - t0) / reps

    # Free every optimizer buffer before the HBM-ceiling measurement.
    del p, o, grads, opt_state, opt_jit
    jax.clear_caches()

    # Part 2: scanned forward+grad with a scalar carry, only `params` and
    # the batch resident.
    @jax.jit
    def bwd_prog(p, img0):
        def body(c, i):
            loss, g = jax.value_and_grad(loss_fn)(
                p, img0 + i.astype(jnp.float32) * 1e-4
            )
            gsum = sum(
                jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(g)
            )
            return c + loss + 0.0 * gsum, None

        tot, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                              jnp.arange(reps))
        return tot

    out = bwd_prog(params, img)  # compile + warmup
    assert np.isfinite(float(out)), "non-finite loss in train bench"
    t0 = time.perf_counter()
    out = bwd_prog(params, img)
    assert np.isfinite(float(out))
    bwd_dt = (time.perf_counter() - t0) / reps

    dt = bwd_dt + opt_dt
    views_per_s = B * V / dt
    ratio = round(views_per_s / ROUND2_TRAIN_VIEWS_PER_S, 3) if on_tpu else 1.0
    record = {
        "metric": f"{V}-view {H}px full train step throughput",
        "value": round(views_per_s, 3),
        "unit": "views/s/chip",
        "vs_round2": ratio,
        "vs_baseline": ratio,  # driver-contract alias of vs_round2
        "baseline_anchor": TRAIN_ANCHOR,
        "measurement": (
            "additive: scanned fwd+grad (scalar carry, "
            f"{bwd_dt * 1e3:.1f} ms) + donated AdamW update "
            f"({opt_dt * 1e3:.1f} ms); deterministic full-modality forward "
            "(the round-2 anchor ran make_train_step's rng-sampled "
            "modality masks + PE indices — excluded here, a sub-ms "
            "program delta)"
        ),
    }
    if on_tpu:
        flops = 3 * analytic_forward_flops(B, V, H, W)
        record["model_tflop"] = round(flops / 1e12, 3)
        record["train_mfu"] = round(flops / dt / (V5E_PEAK_TFLOPS * 1e12), 4)
    print(json.dumps(record), flush=True)


def many_view_bench(model_cls, cfg_cls, views_cls, on_tpu):
    """64-view 518 px images-only inference — the many-view regime the
    context-parallel design targets (the largest V the 16 GB chip runs
    comfortably with the chunked dense head; reference counterpart:
    memory-efficient inference, ``model.py:1440-1618``). ONE JSON line.
    """
    import jax
    import jax.numpy as jnp

    if on_tpu:
        B, V, H, W = 1, 64, 518, 518
        cfg = cfg_cls(compute_dtype="bfloat16", head_chunk_size=8)
        iters = 2
    else:
        B, V, H, W = 1, 4, 56, 56
        cfg = cfg_cls.small(head_chunk_size=2)
        iters = 1

    model = model_cls(cfg)
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(B, V, H, W, 3).astype(np.float32))
    # params are V-independent: init at 2 views to skip a giant init compile
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), views_cls(img=img[:, :2])
    )

    @jax.jit
    def fwd(params, views):
        p = model.apply(params, views)
        return (
            jnp.sum(p.pts3d.astype(jnp.float32)),
            jnp.all(jnp.isfinite(p.pts3d)).astype(jnp.float32),
        )

    s, fin = fwd(params, views_cls(img=img))
    assert float(fin) == 1.0 and np.isfinite(float(s))
    t0 = time.perf_counter()
    for i in range(iters):
        s, fin = fwd(params, views_cls(img=img + jnp.float32((i + 1) * 1e-3)))
    assert np.isfinite(float(s)) and float(fin) == 1.0
    dt = (time.perf_counter() - t0) / iters
    views_per_s = B * V / dt
    record = {
        "metric": f"{V}-view {H}px memory-efficient images-only inference",
        "value": round(views_per_s, 3),
        "unit": "views/s/chip",
        "vs_round4": round(views_per_s / ROUND4_MANYVIEW_VIEWS_PER_S, 3)
        if on_tpu
        else 1.0,
        "vs_baseline": round(views_per_s / ROUND4_MANYVIEW_VIEWS_PER_S, 3)
        if on_tpu
        else 1.0,  # driver-contract alias of vs_round4
        "baseline_anchor": MANYVIEW_ANCHOR,
        "seconds_per_scene": round(dt, 3),
    }
    if on_tpu:
        # Self-justifying roofline context (VERDICT r4 item 6): global
        # attention is O((V*P)^2), so 64 views CANNOT hit the 8-view
        # views/s — the analytic FLOPs + MFU on the record show the slower
        # rate still runs the hardware at the same efficiency.
        flops = analytic_forward_flops(B, V, H, W)
        record["model_tflop"] = round(flops / 1e12, 3)
        record["mfu"] = round(flops / dt / (V5E_PEAK_TFLOPS * 1e12), 4)
    print(json.dumps(record), flush=True)


def _budgeted(label, budget_s, fn, *args):
    """Run one extra bench line under a SIGALRM budget; a failure or
    timeout degrades to an error JSON line instead of masking the
    headline. (SIGALRM only fires between Python bytecodes, so it cannot
    cut short one long in-flight compile — the budgets here bound the
    measured loops and multi-program sequences, which is where the time
    actually goes on a warm-cache driver run.)"""

    def _alarm(signum, frame):
        raise TimeoutError(f"{label} exceeded its {budget_s}s budget")

    old_handler = signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(budget_s)
    try:
        fn(*args)
    except Exception as e:
        print(json.dumps({"metric": f"{label} error", "error": str(e)[:200]}),
              flush=True)
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old_handler)


def _headline_inference(model_cls, cfg_cls, views_cls, on_tpu):
    """The headline 8-view 518 px measurement. Runs in its own frame so
    every device buffer (params, inputs, predictions) is dropped before
    the train bench runs — the flagship train step sits near the 16 GB
    HBM ceiling and a few GB of lingering inference buffers push it over
    (round-3/4 post-mortem: RESOURCE_EXHAUSTED only inside bench.py,
    never in standalone train profiling)."""
    import jax
    import jax.numpy as jnp

    if on_tpu:
        B, V, H, W = 1, 8, 518, 518
        cfg = cfg_cls(compute_dtype="bfloat16")
        iters = 10
    else:
        B, V, H, W = 1, 2, 56, 56
        cfg = cfg_cls.small()
        iters = 2

    model = model_cls(cfg)
    rng = np.random.RandomState(0)

    views0 = views_cls(img=jnp.asarray(rng.randn(B, V, H, W, 3).astype(np.float32)))
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
        views_cls(img=views0.img + jnp.float32(i) * 1e-3) for i in range(iters)
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

    views_per_s = B * V / dt
    flops = analytic_forward_flops(B, V, H, W) if on_tpu else None
    ratio = round(views_per_s / ROUND1_VIEWS_PER_S, 3) if on_tpu else 1.0
    record = {
        "metric": f"{V}-view {H}px images-only metric inference throughput",
        "value": round(views_per_s, 3),
        "unit": "views/s/chip",
        "vs_round1": ratio,
        "vs_baseline": ratio,  # driver-contract alias of vs_round1
        "baseline_anchor": INFER_ANCHOR,
    }
    if flops is not None:
        record["model_tflop"] = round(flops / 1e12, 3)
        record["mfu"] = round(flops / dt / (V5E_PEAK_TFLOPS * 1e12), 4)
    return record


def _run_inline(which, on_tpu):
    """Run one bench line in THIS process (used by the subprocess children
    and by the CPU smoke path)."""
    from mapanything_tpu.models.mapanything import (
        MapAnything,
        MapAnythingConfig,
        Views,
    )

    if which == "many-view":
        many_view_bench(MapAnything, MapAnythingConfig, Views, on_tpu)
    elif which == "train":
        train_bench(MapAnything, MapAnythingConfig, on_tpu)
    elif which == "headline":
        print(json.dumps(
            _headline_inference(MapAnything, MapAnythingConfig, Views, on_tpu)
        ))
    else:  # pragma: no cover
        raise ValueError(which)


def _run_subprocess(which, budget_s):
    """Run one bench line in its OWN process so every measurement sees a
    clean chip. Measured on the v5e: the 64-view program runs 9.6 s/scene
    when any other flagship program has touched the chip in the same
    process vs 4.6 s/scene standalone, and the flagship train step
    RESOURCE_EXHAUSTs — process isolation is the only reliable reset.
    Forwards the child's JSON lines; degrades to an error line on
    timeout/failure so the headline is never masked."""
    import subprocess
    import sys

    t_end = time.monotonic() + budget_s
    last_tail = ""
    for attempt in (1, 2):  # one retry: the remote-compile tunnel can
        remaining = t_end - time.monotonic()  # drop a response mid-stream
        if remaining < 30:
            break
        try:
            proc = subprocess.run(
                [sys.executable, "-u", os.path.abspath(__file__),
                 "--only", which],
                timeout=remaining,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        except subprocess.TimeoutExpired:
            print(json.dumps({"metric": f"{which} bench error",
                              "error": f"timed out after {budget_s}s"}),
                  flush=True)
            return
        printed = False
        for ln in proc.stdout.splitlines():
            if ln.startswith("{"):
                print(ln, flush=True)
                printed = True
        if printed:  # record emitted — exit noise after it doesn't matter
            return
        last_tail = " | ".join(proc.stdout.splitlines()[-3:])[-300:]
    print(json.dumps({"metric": f"{which} bench error",
                      "error": last_tail or "budget exhausted"}), flush=True)


def _probe_on_tpu() -> bool:
    """Decide TPU-vs-CPU in a SUBPROCESS so the dispatching parent never
    initializes the backend: on standard local-host TPU, libtpu takes
    exclusive device ownership and an initialized parent would starve the
    per-line child processes (over the axon tunnel this doesn't bite, but
    the probe makes the isolation scheme transport-independent —
    ADVICE r4)."""
    import subprocess
    import sys

    try:
        out = subprocess.run(
            [sys.executable, "-c", "import jax; print(jax.default_backend())"],
            timeout=300,
            stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL,
            text=True,
        )
        lines = [ln.strip() for ln in out.stdout.splitlines() if ln.strip()]
        return bool(lines) and lines[-1] not in ("cpu",)
    except Exception:
        return False


def main():
    import argparse

    import jax

    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None,
                    choices=["many-view", "train", "headline"])
    args = ap.parse_args()

    # Persistent compile cache: the 518 px 8-view program takes minutes to
    # compile over the remote-compile tunnel; cache so repeat runs are fast.
    # (TPU executables are serialized server-side — unlike XLA:CPU AOT
    # entries they are not keyed to host CPU features.)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    if args.only:
        # Child process: it owns the chip for its one measurement, so
        # initializing the backend here is fine on any transport.
        on_tpu = jax.default_backend() not in ("cpu",)
        _run_inline(args.only, on_tpu)
        return

    on_tpu = _probe_on_tpu()

    if on_tpu:
        # Each line in its own subprocess (clean chip per measurement);
        # headline LAST so the driver's parsed record remains comparable
        # across rounds.
        _run_subprocess("many-view", 1500)
        _run_subprocess("train", 2700)
        _run_subprocess("headline", 2700)
    else:
        # CPU smoke: tiny shapes, one process is fine.
        _budgeted("many-view bench", 1500, _run_inline, "many-view", on_tpu)
        _budgeted("train bench", 2700, _run_inline, "train", on_tpu)
        _run_inline("headline", on_tpu)


if __name__ == "__main__":
    main()
