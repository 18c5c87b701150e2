"""Head-pair packing for the d=64 global-attention kernel — measured verdict.

VERDICT r4 item 2: head_dim 64 uses half the MXU's 128-wide contraction;
the proposed structurally-different schedule packs TWO heads into one
128-deep contraction (block-diagonal with masked cross terms). This
script settles it on the chip, three ways:

1. **Cycle-level microbench** of the raw matmul forms: per-head
   (T,64)@(64,T) at half contraction efficiency vs block-diagonal
   (T,128)@(128,2T) at full efficiency. Block-diagonal zero-padding
   CONSERVES total MACs (the zero lanes burn exactly what the K=64
   granularity tax burned), so the prediction is parity — this measures
   whether the hardware/compiler sees it differently.

2. **Pair-packed streaming attention kernel**: a Pallas variant where
   each grid step holds one head PAIR; K/V blocks are expanded to
   block-diagonal (2*bk, 128) inside the kernel (two VPU mask passes) so
   the QK and PV matmuls run at full 128-lane contraction, with per-head
   softmax sums. Grid is half as deep (bh/2); the score matrix per step
   is (bq, 2*bk).

3. The production augmented-column streaming kernel as the baseline, at
   the model's global regime (1 x 10953 tokens, h12 d64), measured as a
   12-layer scan with distinct inputs + final checksum fetch
   (docs/PERFORMANCE.md "Measurement discipline").

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_head_packing.py
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from mapanything_tpu.ops.flash_attention import (
    DEFAULT_BLOCK_K,
    DEFAULT_BLOCK_Q,
    _pair_forward,
    _run_3d,
)


def production_attention(q, k, v, scale):
    """The pre-round-5 production path: augmented-column streaming kernel
    (lse-free primal), including its (B,T,H,D)->(BH,T,D) relayout."""
    return _run_3d(q, k, v, scale, DEFAULT_BLOCK_Q, DEFAULT_BLOCK_K,
                   False, with_lse=False)[0]


def pair_packed_attention(q, k, v, scale, block_q=1024, block_k=1024):
    """Round-5 head-pair packed kernel (now the integrated long-regime
    inference primal in ops/flash_attention.py)."""
    return _pair_forward(q, k, v, scale, block_q, block_k, False)

# ---------------------------------------------------------------------------
# Short-regime pair probe: single-K-pass kernel with head-PAIR channel
# windows (the production packed kernel loops heads in 64-lane slices of a
# wider window; this variant computes one PAIR per inner step with
# block-diagonal K/V — half the matmul calls at double width). Native
# (B, T, C) layout, no transposes, no bias (full-T K blocks, constant
# shift cancels) — only worth integrating if it beats the packed kernel
# at the encoder/frame shapes.
# ---------------------------------------------------------------------------

import functools

import jax.numpy as _jnp  # noqa: F401  (kernel-local alias clarity)
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mapanything_tpu.ops.flash_attention import (  # noqa: E402
    LOG2E,
    _pad_to,
    _use_packed,
    flash_attention,
)


def _short_pair_kernel(q_ref, k_ref, v_ref, o_ref):
    q = q_ref[0]  # (bq, 128) = [q0 | q1], pre-scaled
    k = k_ref[0]  # (tk, 128)
    v = v_ref[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    m0 = (lane < 64).astype(k.dtype)
    m1 = (lane >= 64).astype(k.dtype)
    kbd = jnp.concatenate([k * m0, k * m1], axis=0)  # (2tk, 128)
    vbd = jnp.concatenate([v * m0, v * m1], axis=0)
    tk = k.shape[0]

    s = jax.lax.dot_general(
        q, kbd, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (bq, 2tk)
    p = jnp.exp2(s)
    l0 = jnp.maximum(jnp.sum(p[:, :tk], axis=1, keepdims=True), 1e-37)
    l1 = jnp.maximum(jnp.sum(p[:, tk:], axis=1, keepdims=True), 1e-37)
    pv = jax.lax.dot_general(
        p.astype(v.dtype), vbd, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (bq, 128)
    lane_o = jax.lax.broadcasted_iota(jnp.int32, pv.shape, 1)
    o_ref[0] = (pv / jnp.where(lane_o < 64, l0, l1)).astype(o_ref.dtype)


def short_pair_attention(q, k, v, scale, block_q=None):
    """(B, T, H, 64) short-regime attention, one head pair per grid row."""
    b, tq, h, d = q.shape
    assert d == 64 and h % 2 == 0
    tk = k.shape[1]
    c = h * d
    # the (bq, 2*tk) fp32 score matrix bounds bq: 512 x 2740 = 5.6 MB
    # (+ bf16 cast) fits scoped VMEM where the full-tq 1408 block OOMs
    bq = block_q or 512
    tq_pad = _pad_to(tq, bq)

    qc = (q * jnp.asarray(scale * LOG2E, q.dtype)).reshape(b, tq, c)
    if tq_pad != tq:
        qc = jnp.pad(qc, ((0, 0), (0, tq_pad - tq), (0, 0)))
    kc = k.reshape(b, tk, c)
    vc = v.reshape(b, tk, c)

    o = pl.pallas_call(
        _short_pair_kernel,
        grid=(b, h // 2, tq_pad // bq),
        in_specs=[
            pl.BlockSpec((1, bq, 128), lambda bi, hi, i: (bi, i, hi)),
            pl.BlockSpec((1, tk, 128), lambda bi, hi, i: (bi, 0, hi)),
            pl.BlockSpec((1, tk, 128), lambda bi, hi, i: (bi, 0, hi)),
        ],
        out_specs=pl.BlockSpec((1, bq, 128), lambda bi, hi, i: (bi, i, hi)),
        out_shape=jax.ShapeDtypeStruct((b, tq_pad, c), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
    )(qc, kc, vc)
    return o[:, :tq].reshape(b, tq, h, d)


def run_short_probe(layers=8):
    rng = np.random.RandomState(0)
    for label, (b, t, h) in (
        ("encoder 8x1370 h16", (8, 1370, 16)),
        ("frame   8x1369 h12", (8, 1369, 12)),
    ):
        q = jnp.asarray(rng.randn(b, t, h, 64), jnp.bfloat16)
        k = jnp.asarray(rng.randn(b, t, h, 64), jnp.bfloat16)
        v = jnp.asarray(rng.randn(b, t, h, 64), jnp.bfloat16)
        scale = 64**-0.5
        assert _use_packed(q, k, False), "expected the packed short regime"
        o_ref = flash_attention(q, k, v, scale=scale)
        o_pair = short_pair_attention(q, k, v, scale)
        err = float(jnp.max(jnp.abs(
            o_ref.astype(jnp.float32) - o_pair.astype(jnp.float32))))
        t_prod = _time_scan(
            lambda q_, k_, v_: flash_attention(q_, k_, v_, scale=scale),
            (q, k, v), layers)
        t_pair = _time_scan(
            lambda q_, k_, v_: short_pair_attention(q_, k_, v_, scale),
            (q, k, v), layers)
        flops = 4 * b * t * t * 64 * h
        print(f"[short {label}] err {err:.1e}  packed "
              f"{t_prod*1e3:6.2f} ms ({flops/t_prod/1e12:.0f} TF/s)  pair "
              f"{t_pair*1e3:6.2f} ms ({flops/t_pair/1e12:.0f} TF/s)  "
              f"ratio {t_pair/t_prod:.3f}", flush=True)


# ---------------------------------------------------------------------------
# Measurement harness (multi-layer scan + checksum; PERFORMANCE.md rules)
# ---------------------------------------------------------------------------


def _time_scan(fn, inputs, layers, reps=3):
    @jax.jit
    def prog(xs):
        def body(c, x):
            out = fn(*x)
            return c + jnp.sum(out.astype(jnp.float32)), None

        tot, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), xs)
        return tot

    xs = jax.tree.map(
        lambda a: jnp.stack([a + jnp.asarray(i * 1e-3, a.dtype) for i in range(layers)]),
        inputs,
    )
    prog(xs).block_until_ready()
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        float(prog(xs))
        best = min(best, time.perf_counter() - t0)
    return best / layers


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tokens", type=int, default=10953)
    ap.add_argument("--heads", type=int, default=12)
    ap.add_argument("--layers", type=int, default=12)
    ap.add_argument("--sweep", action="store_true")
    ap.add_argument("--short", action="store_true")
    args = ap.parse_args()

    if args.short:
        run_short_probe()
        return

    T, H, D = args.tokens, args.heads, 64
    rng = np.random.RandomState(0)
    scale = D**-0.5

    # --- 1. raw matmul forms ---------------------------------------------
    Tm = 4096
    a64 = jnp.asarray(rng.randn(H, Tm, 64), jnp.bfloat16)
    b64 = jnp.asarray(rng.randn(H, Tm, 64), jnp.bfloat16)
    a128 = jnp.asarray(rng.randn(H // 2, Tm, 128), jnp.bfloat16)
    b128bd = jnp.asarray(rng.randn(H // 2, 2 * Tm, 128), jnp.bfloat16)

    t_sep = _time_scan(
        lambda x, y: jnp.einsum("htd,hsd->hts", x, y), (a64, b64), 8
    )
    t_pack = _time_scan(
        lambda x, y: jnp.einsum("htd,hsd->hts", x, y), (a128, b128bd), 8
    )
    print(f"[matmul] per-head d=64 QK ({H}x{Tm}^2):      {t_sep*1e3:8.2f} ms")
    print(f"[matmul] block-diag d=128 ({H//2}x{Tm}x{2*Tm}): {t_pack*1e3:8.2f} ms")
    print(f"[matmul] pack/sep ratio: {t_pack/t_sep:.3f} (1.0 = MAC-parity)")

    # --- 2/3. attention kernels at the global regime ---------------------
    q = jnp.asarray(rng.randn(1, T, H, D), jnp.bfloat16)
    k = jnp.asarray(rng.randn(1, T, H, D), jnp.bfloat16)
    v = jnp.asarray(rng.randn(1, T, H, D), jnp.bfloat16)

    o_ref = production_attention(q, k, v, scale=scale)
    o_pair = pair_packed_attention(q, k, v, scale=scale)
    err = float(
        jnp.max(jnp.abs(o_ref.astype(jnp.float32) - o_pair.astype(jnp.float32)))
    )
    print(f"[check] pair kernel vs production: max_err {err:.2e}")
    assert err < 2e-2, "pair kernel disagrees with production"

    t_prod = _time_scan(
        lambda q_, k_, v_: production_attention(q_, k_, v_, scale=scale),
        (q, k, v), args.layers,
    )
    t_pair = _time_scan(
        lambda q_, k_, v_: pair_packed_attention(q_, k_, v_, scale=scale),
        (q, k, v), args.layers,
    )
    flops = 4 * T * T * D * H  # useful MACs*2 per layer
    print(f"[attn] production aug kernel: {t_prod*1e3:8.2f} ms/layer "
          f"({flops/t_prod/1e12:.1f} useful TFLOP/s)")
    print(f"[attn] pair-packed kernel:    {t_pair*1e3:8.2f} ms/layer "
          f"({flops/t_pair/1e12:.1f} useful TFLOP/s)")
    print(f"[attn] pair/production ratio: {t_pair/t_prod:.3f}")

    if args.sweep:
        for bq in (512, 1024, 2048):
            for bk in (512, 1024, 2048):
                try:
                    t = _time_scan(
                        lambda q_, k_, v_: pair_packed_attention(
                            q_, k_, v_, scale=scale, block_q=bq, block_k=bk
                        ),
                        (q, k, v), args.layers,
                    )
                    print(f"[sweep] pair ({bq:4d},{bk:4d}): {t*1e3:7.2f} "
                          f"ms/layer ({flops/t/1e12:.1f} TFLOP/s)", flush=True)
                except Exception as e:
                    print(f"[sweep] pair ({bq:4d},{bk:4d}): FAIL "
                          f"{str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
