"""Microbenchmark DPT head internals on the real chip.

Separates DPTFeature (fusion pyramid) from DPTRegressionProcessor, and
compares the gather-based align-corners bilinear resize against a dense
interpolation-matrix (MXU) formulation at the regressor's scale.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/bench_dpt_parts.py
"""

from __future__ import annotations

import time

import numpy as np

REPS = 8


def timed(label, program, args, n_timing=3, divisor=REPS):
    import jax.numpy as jnp

    out = program(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    outs = [program(*args) for _ in range(n_timing)]
    float(jnp.sum(outs[-1].astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / n_timing / divisor
    print(f"{label:>28}: {dt * 1e3:8.2f} ms/iter", flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from mapanything_tpu.models.heads.dpt import (
        DPTFeature,
        DPTRegressionProcessor,
        _resize_bilinear_align_corners,
    )

    B, H, W = 8, 518, 518
    h, w = 37, 37
    emb, dim = 1024, 768
    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(0)

    def scanned(fn, seed_val):
        def prog(*args):
            def body(c, _):
                y = fn(c, *args)
                return jnp.sum(y.astype(jnp.float32)), ()

            c, _ = jax.lax.scan(body, jnp.float32(seed_val), None, length=REPS)
            return c

        return jax.jit(prog)

    x0 = jnp.asarray(rng.randn(B, h, w, emb).astype(np.float32))
    xs0 = [x0] + [
        jnp.asarray(rng.randn(B, h, w, dim).astype(np.float32)) for _ in range(3)
    ]

    dptf = DPTFeature(
        hooks=(0, 1, 2, 3), input_feature_dims=(emb, dim, dim, dim),
        layer_dims=(96, 192, 384, 768), feature_dim=256, dtype=jnp.float32,
    )
    p_f = jax.jit(dptf.init)(key, xs0)

    timed(
        "DPTFeature (fusion)",
        scanned(lambda c, pf: dptf.apply(pf, [x + c * 1e-9 for x in xs0]), 0.0),
        (p_f,),
    )

    feat0 = jax.jit(dptf.apply)(p_f, xs0)  # (B, 296, 296, 256)
    dptr = DPTRegressionProcessor(output_dim=6, dtype=jnp.float32)
    p_r = jax.jit(lambda k, x: dptr.init(k, x, (H, W)))(key, feat0)
    timed(
        "DPTRegressor",
        scanned(lambda c, pr, f: dptr.apply(pr, f + c * 1e-9, (H, W)), 0.0),
        (p_r, feat0),
    )

    # resize alone at regressor scale: (8, 296, 296, 128) -> (8, 518, 518, 128)
    r0 = jnp.asarray(rng.randn(B, 296, 296, 128).astype(np.float32))
    timed(
        "gather resize 296->518 C128",
        scanned(lambda c, x: _resize_bilinear_align_corners(x + c * 1e-9, (H, W)), 0.0),
        (r0,),
    )

    # dense interpolation-matrix resize (MXU)
    def interp_matrix(n_in, n_out):
        pos = np.arange(n_out) * (n_in - 1) / (n_out - 1)
        i0 = np.clip(np.floor(pos).astype(np.int64), 0, n_in - 1)
        i1 = np.clip(i0 + 1, 0, n_in - 1)
        t = (pos - i0).astype(np.float32)
        M = np.zeros((n_out, n_in), np.float32)
        M[np.arange(n_out), i0] += 1 - t
        M[np.arange(n_out), i1] += t
        return jnp.asarray(M)

    Mh = interp_matrix(296, H)
    Mw = interp_matrix(296, W)

    def matmul_resize(x, prec):
        y = jnp.einsum("oh,bhwc->bowc", Mh, x, precision=prec)
        return jnp.einsum("pw,bowc->bopc", Mw, y, precision=prec)

    for prec in ("default", "highest"):
        timed(
            f"matmul resize ({prec})",
            scanned(lambda c, x, p=prec: matmul_resize(x + c * 1e-9, p), 0.0),
            (r0,),
        )

    # correctness cross-check (on-device, fp32)
    a = jax.jit(lambda x: _resize_bilinear_align_corners(x, (H, W)))(r0)
    bm = jax.jit(lambda x: matmul_resize(x, "highest"))(r0)
    err = float(jnp.max(jnp.abs(a - bm)))
    print(f"max |gather - matmul(highest)| = {err:.2e}")


if __name__ == "__main__":
    main()
