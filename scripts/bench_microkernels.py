"""Microbenchmarks: MXU matmul ceiling + attention kernels at model shapes.

Estimates the speed-of-light for the bench regime on the attached chip:
  - chained bf16 matmuls at trunk/encoder token counts (MXU utilization);
  - Pallas flash attention vs XLA fused attention at the three attention
    regimes of the flagship model (encoder 8x1370, frame 8x1369, global
    1x10953 tokens).

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/bench_microkernels.py
"""

from __future__ import annotations

import time

import numpy as np


def timeit(fn, args_list, label, work_flops=None):
    import jax.numpy as jnp

    out = fn(*args_list[0])
    float(jnp.sum(out.astype(jnp.float32)))  # warmup + drain
    t0 = time.perf_counter()
    sums = []
    for a in args_list[1:]:
        sums.append(jnp.sum(fn(*a).astype(jnp.float32)))
    assert np.isfinite(float(sums[-1]))
    dt = (time.perf_counter() - t0) / (len(args_list) - 1)
    msg = f"{label:>40}: {dt * 1e3:8.2f} ms"
    if work_flops:
        msg += f"  ({work_flops / dt / 1e12:6.1f} TFLOP/s)"
    print(msg, flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from mapanything_tpu.ops.flash_attention import flash_attention

    rng = np.random.RandomState(0)
    ITERS = 6

    # ---- 1. pure matmul ceiling (bf16, MLP-shaped, scanned 24x) ----
    N, D, F = 10960, 1024, 4096
    w1 = jnp.asarray(rng.randn(D, F).astype(np.float32) * 0.02).astype(jnp.bfloat16)
    w2 = jnp.asarray(rng.randn(F, D).astype(np.float32) * 0.02).astype(jnp.bfloat16)

    @jax.jit
    def mlp24(x):
        def body(h, _):
            h = jnp.tanh(h @ w1) @ w2
            return h, ()
        h, _ = jax.lax.scan(body, x, None, length=24)
        return h

    xs = [
        (jnp.asarray(rng.randn(N, D).astype(np.float32)).astype(jnp.bfloat16),)
        for _ in range(ITERS)
    ]
    flops = 24 * 2 * 2 * N * D * F  # 24 layers x (two matmuls) x 2NDf
    timeit(mlp24, xs, f"bf16 MLP24 ({N}x{D}x{F})", flops)

    # ---- 2. attention regimes ----
    def attn_args(b, t, h, d, n):
        return [
            (
                jnp.asarray(rng.randn(b, t, h, d).astype(np.float32)).astype(jnp.bfloat16),
                jnp.asarray(rng.randn(b, t, h, d).astype(np.float32)).astype(jnp.bfloat16),
                jnp.asarray(rng.randn(b, t, h, d).astype(np.float32)).astype(jnp.bfloat16),
            )
            for _ in range(n)
        ]

    regimes = [
        ("encoder 8x1370 h16 d64", 8, 1370, 16, 64),
        ("frame 8x1369 h12 d64", 8, 1369, 12, 64),
        ("global 1x10953 h12 d64", 1, 10953, 12, 64),
    ]
    for label, b, t, h, d in regimes:
        args = attn_args(b, t, h, d, ITERS)
        fl = 4 * b * t * t * h * d  # 2 matmuls x 2BT^2(hd)

        @jax.jit
        def pallas12(q, k, v):
            def body(acc, _):
                acc = flash_attention(q + acc * jnp.bfloat16(1e-6), k, v)
                return acc, ()
            acc, _ = jax.lax.scan(body, jnp.zeros_like(q), None, length=12)
            return acc

        @jax.jit
        def xla12(q, k, v):
            def body(acc, _):
                acc = jax.nn.dot_product_attention(
                    q + acc * jnp.bfloat16(1e-6), k, v
                )
                return acc, ()
            acc, _ = jax.lax.scan(body, jnp.zeros_like(q), None, length=12)
            return acc

        timeit(pallas12, args, f"pallas x12 {label}", 12 * fl)
        timeit(xla12, args, f"xla x12 {label}", 12 * fl)


if __name__ == "__main__":
    main()
