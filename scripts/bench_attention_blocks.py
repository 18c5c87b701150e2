"""Sweep flash-attention block sizes at the model's short-sequence regimes.

The encoder (8x1370 tokens) and frame-attention (8x1369) regimes pad K from
1370 to 2048 with the default (1024, 1024) blocks — 33% wasted K columns plus
online-softmax bookkeeping across 2 k-steps. This sweeps (block_q, block_k)
including full-K single-step variants, scanned x12 inside one program.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/bench_attention_blocks.py
"""

from __future__ import annotations

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from mapanything_tpu.ops.flash_attention import flash_attention

    rng = np.random.RandomState(0)

    def run(label, b, t, h, d, bq, bk, n_timing=3):
        q = jnp.asarray(rng.randn(b, t, h, d).astype(np.float32)).astype(jnp.bfloat16)
        k = jnp.asarray(rng.randn(b, t, h, d).astype(np.float32)).astype(jnp.bfloat16)
        v = jnp.asarray(rng.randn(b, t, h, d).astype(np.float32)).astype(jnp.bfloat16)

        @jax.jit
        def prog(q, k, v):
            def body(acc, _):
                acc = flash_attention(
                    q + acc * jnp.bfloat16(1e-9), k, v, block_q=bq, block_k=bk
                )
                return acc, ()

            acc, _ = jax.lax.scan(body, jnp.zeros_like(q), None, length=12)
            return jnp.sum(acc.astype(jnp.float32))

        try:
            out = prog(q, k, v)
            val = float(out)
            assert np.isfinite(val)
        except Exception as e:
            print(f"{label:>44}: FAILED ({type(e).__name__})", flush=True)
            return
        t0 = time.perf_counter()
        vals = [prog(q, k, v) for _ in range(n_timing)]
        float(vals[-1])
        dt = (time.perf_counter() - t0) / n_timing / 12
        fl = 4 * b * t * t * h * d
        print(f"{label:>44}: {dt * 1e3:7.2f} ms ({fl / dt / 1e12:5.1f} TFLOP/s)", flush=True)

    for (name, b, t, h, d) in [
        ("global 1x10953 h12", 1, 10953, 12, 64),
    ]:
        for bq, bk in [
            (1024, 1024),
            (1024, 1536),
            (1408, 1536),
            (1024, 2048),
            (1408, 2048),
            (2048, 1536),
            (1408, 1024),
        ]:
            run(f"{name} bq={bq} bk={bk}", b, t, h, d, bq, bk)




if __name__ == "__main__":
    main()
