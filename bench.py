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

    views_per_s = B * V / dt
    print(
        json.dumps(
            {
                "metric": f"{V}-view {H}px images-only metric inference throughput",
                "value": round(views_per_s, 3),
                "unit": "views/s/chip",
                "vs_baseline": (
                    round(views_per_s / ROUND1_VIEWS_PER_S, 3) if on_tpu else 1.0
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
