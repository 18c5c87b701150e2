"""Benchmark harness: N-view inference throughput on the real chip.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

The headline metric is multi-view reconstruction throughput (views/s) at
the production patch resolution regime, mirroring the reference's
views/s/chip framing (BASELINE.md). ``vs_baseline`` is measured against the
reference's single-GPU design goal of real-time multi-view inference; until
the reference numbers are replicated on identical hardware we report the
ratio vs our own first-round baseline (1.0 = parity with round-1).
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from mapanything_tpu.models.mapanything import (
        MapAnything,
        MapAnythingConfig,
        Views,
        full_modality_masks,
    )

    on_tpu = jax.default_backend() not in ("cpu",)

    # Production-shaped model at a bench-friendly resolution.
    B, V, H, W = 1, 4, 252, 252  # 18x18 patches per view
    if not on_tpu:
        B, V, H, W = 1, 2, 56, 56

    cfg = MapAnythingConfig(
        encoder_size="large" if on_tpu else "small",
        info_sharing_depth=24 if on_tpu else 4,
        info_sharing_dim=768 if on_tpu else 256,
        info_sharing_num_heads=12 if on_tpu else 4,
        info_sharing_indices=(11, 17) if on_tpu else (1, 2),
        dpt_feature_dim=256 if on_tpu else 64,
        dpt_layer_dims=(96, 192, 384, 768) if on_tpu else (32, 48, 64, 96),
        compute_dtype="bfloat16" if on_tpu else "float32",
    )
    model = MapAnything(cfg)

    rng = np.random.RandomState(0)
    views = Views(img=jnp.asarray(rng.randn(B, V, H, W, 3).astype(np.float32)))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), views)

    fwd = jax.jit(lambda p, v: model.apply(p, v))
    # Warmup / compile.
    preds = jax.block_until_ready(fwd(params, views))
    assert bool(jnp.isfinite(preds.pts3d).all()), "non-finite predictions"

    iters = 10 if on_tpu else 2
    t0 = time.perf_counter()
    for _ in range(iters):
        preds = fwd(params, views)
    jax.block_until_ready(preds.pts3d)
    dt = (time.perf_counter() - t0) / iters

    views_per_s = B * V / dt
    print(
        json.dumps(
            {
                "metric": f"{V}-view {H}px images-only inference throughput",
                "value": round(views_per_s, 3),
                "unit": "views/s/chip",
                "vs_baseline": 1.0,
            }
        )
    )


if __name__ == "__main__":
    main()
