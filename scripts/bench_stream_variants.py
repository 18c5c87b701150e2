#!/usr/bin/env python
"""Variant sweep for the LONG-regime (global attention) streaming kernel.

The roofline (docs/PERFORMANCE.md) puts the augmented-column streaming
kernel at ~78 of its ~98 TFLOP/s head_dim-64 ceiling, and the round-2
no-exp2 experiment showed the VPU softmax passes do not fully hide behind
the MXU in this regime. This sweeps:

  - block shapes (bq, bk) for the aug kernel (the round-2 sweep predates
    the augmented-column form);
  - a bf16-exp2 variant (exp2 + the p-cast collapse into one bf16 VPU
    pass at half the lanes; costs <=2^-8 relative score quantization —
    below bf16 matmul noise);
  - the plain additive-bias streaming kernel for reference.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/bench_stream_variants.py
"""

from __future__ import annotations

import functools
import time

import numpy as np

LAYERS = 12
N_TIMING = 3


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from mapanything_tpu.ops.flash_attention import (
        _augment_qkv,
        _pad_to,
        LOG2E,
        NEG_INF,
        SHIFT2,
        flash_attention,
    )

    B, T, H, D = 1, 10953, 12, 64
    scale = D**-0.5
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, T, H, D).astype(np.float32)).astype(jnp.bfloat16)
    k = jnp.asarray(rng.randn(B, T, H, D).astype(np.float32)).astype(jnp.bfloat16)
    v = jnp.asarray(rng.randn(B, T, H, D).astype(np.float32)).astype(jnp.bfloat16)

    flops = LAYERS * 4 * T * T * D * H  # useful attention FLOPs of the scan

    def timed(label, fn):
        @jax.jit
        def prog(q, k, v):
            def body(acc, _):
                acc = fn(q + acc * jnp.bfloat16(1e-9), k, v)
                return acc, ()

            acc, _ = jax.lax.scan(body, jnp.zeros_like(q), None, length=LAYERS)
            return jnp.sum(acc.astype(jnp.float32))

        try:
            out = prog(q, k, v)
            val = float(out)
            assert np.isfinite(val), val
        except Exception as e:
            print(f"{label:>40}: FAILED ({type(e).__name__}: {str(e)[:80]})",
                  flush=True)
            return
        t0 = time.perf_counter()
        outs = [prog(q, k, v) for _ in range(N_TIMING)]
        float(outs[-1])
        dt = (time.perf_counter() - t0) / N_TIMING
        print(f"{label:>40}: {dt*1e3:7.2f} ms  {flops/dt/1e12:6.1f} TFLOP/s",
              flush=True)

    def aug_stream(bq, bk, exp_dtype):
        """Aug streaming kernel with configurable blocks / exp dtype."""

        def kern(q_ref, k_ref, v_ref, o_ref, acc):
            j = pl.program_id(2)
            num_k = pl.num_programs(2)
            d = o_ref.shape[-1]

            @pl.when(j == 0)
            def _init():
                acc[:] = jnp.zeros_like(acc)

            s = jax.lax.dot_general(
                q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if exp_dtype == jnp.bfloat16:
                p = jnp.exp2(s.astype(jnp.bfloat16))
            else:
                p = jnp.exp2(s).astype(v_ref.dtype)
            acc[:] += jax.lax.dot_general(
                p, v_ref[0], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

            @pl.when(j == num_k - 1)
            def _finish():
                l = jnp.maximum(acc[:, d:d + 1], 1e-37)
                o_ref[0] = (acc[:, :d] / l).astype(o_ref.dtype)

        def run(q, k, v):
            b, tq, h, d = q.shape
            tk = k.shape[1]
            tq_pad = _pad_to(tq, bq)
            tk_pad = _pad_to(tk, bk)
            col = jnp.arange(tk_pad)
            bias = jnp.where(col < tk, -SHIFT2, NEG_INF).astype(jnp.float32)[None, :]

            def to3(x, t_pad):
                x = jnp.swapaxes(x, 1, 2).reshape(b * h, x.shape[1], d)
                if x.shape[1] != t_pad:
                    x = jnp.pad(x, ((0, 0), (0, t_pad - x.shape[1]), (0, 0)))
                return x

            q3 = to3(q * jnp.asarray(scale * LOG2E, q.dtype), tq_pad)
            k3 = to3(k, tk_pad)
            v3 = to3(v, tk_pad)
            qa, ka, va, dl = _augment_qkv(q3, k3, v3, bias)
            (o3,) = pl.pallas_call(
                kern,
                grid=(b * h, tq_pad // bq, tk_pad // bk),
                in_specs=[
                    pl.BlockSpec((1, bq, dl), lambda bb, i, j: (bb, i, 0)),
                    pl.BlockSpec((1, bk, dl), lambda bb, i, j: (bb, j, 0)),
                    pl.BlockSpec((1, bk, dl), lambda bb, i, j: (bb, j, 0)),
                ],
                out_specs=[
                    pl.BlockSpec((1, bq, d), lambda bb, i, j: (bb, i, 0))
                ],
                out_shape=[jax.ShapeDtypeStruct((b * h, tq_pad, d), q.dtype)],
                scratch_shapes=[pltpu.VMEM((bq, dl), jnp.float32)],
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel", "parallel", "arbitrary"),
                ),
            )(qa, ka, va)
            return o3[:, :tq].reshape(b, h, tq, d).swapaxes(1, 2)

        return run

    timed("production flash_attention (aug 1024/1024)",
          lambda q, k, v: flash_attention(q, k, v, scale))
    for bq, bk in [(1024, 1024), (512, 1024), (2048, 1024), (1024, 512),
                   (1024, 2048), (512, 2048), (2048, 512)]:
        timed(f"aug fp32-exp2 bq={bq} bk={bk}",
              aug_stream(bq, bk, jnp.float32))
    for bq, bk in [(1024, 1024), (2048, 1024), (1024, 2048)]:
        timed(f"aug bf16-exp2 bq={bq} bk={bk}",
              aug_stream(bq, bk, jnp.bfloat16))

    # Numeric check of the bf16-exp2 variant vs production at model scale.
    import jax.numpy as jnp2
    ref = flash_attention(q, k, v, scale)
    got = aug_stream(1024, 1024, jnp.bfloat16)(q, k, v)
    err = float(jnp2.max(jnp2.abs(got.astype(jnp2.float32)
                                  - ref.astype(jnp2.float32))))
    print(f"bf16-exp2 vs production max err: {err:.3e}", flush=True)


if __name__ == "__main__":
    main()
