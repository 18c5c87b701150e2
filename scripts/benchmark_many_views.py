"""Many-view memory-efficient inference benchmark (BASELINE.json config 4).

Runs the flagship model images-only at N views / 518 px on one chip with
the chunked dense head (the reference's memory-efficient inference,
``model.py:1440-1618``, re-designed as a ``lax.map`` chunk loop) and
reports throughput. 100 views: ~10.2 s (9.8 views/s) on a v5e —
the global-attention layers are O((V*H*W)^2), so views/s falls with V;
the flash kernels keep the score matrices in VMEM at any V.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/benchmark_many_views.py --views 100
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--views", type=int, default=100)
    ap.add_argument("--res", type=int, default=518)
    ap.add_argument("--head-chunk", type=int, default=10)
    ap.add_argument("--iters", type=int, default=2)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from mapanything_tpu.models.mapanything import (
        MapAnything,
        MapAnythingConfig,
        Views,
    )

    B, V, H, W = 1, args.views, args.res, args.res
    chunk = max(d for d in range(1, args.head_chunk + 1) if (B * V) % d == 0)
    cfg = MapAnythingConfig(compute_dtype="bfloat16", head_chunk_size=chunk)
    model = MapAnything(cfg)
    rng = np.random.RandomState(0)
    views = Views(img=jnp.asarray(rng.randn(B, V, H, W, 3).astype(np.float32)))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), Views(img=views.img[:, :2]))

    @jax.jit
    def fwd(params, views):
        p = model.apply(params, views)
        return (
            jnp.sum(p.pts3d.astype(jnp.float32)),
            jnp.all(jnp.isfinite(p.pts3d)).astype(jnp.float32),
        )

    s, fin = fwd(params, views)
    assert float(fin) == 1.0 and np.isfinite(float(s))
    t0 = time.perf_counter()
    for i in range(args.iters):
        s, fin = fwd(params, Views(img=views.img + jnp.float32((i + 1) * 1e-3)))
    assert np.isfinite(float(s)) and float(fin) == 1.0
    dt = (time.perf_counter() - t0) / args.iters
    print(json.dumps({
        "metric": f"{V}-view {args.res}px memory-efficient inference",
        "value": round(V / dt, 2),
        "unit": "views/s/chip",
        "seconds_per_scene": round(dt, 2),
    }))


if __name__ == "__main__":
    main()
