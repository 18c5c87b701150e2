"""Pallas TPU flash attention (forward + backward) with base-2 softmax.

This replaces the reference's single hot kernel —
``F.scaled_dot_product_attention`` (CUDA flash attention,
``uniception/models/utils/transformer_blocks.py:199,328``) — with a
TPU-native tiled kernel:

  - O(N) HBM traffic: q/k/v stream through VMEM in (block_q, block_k)
    tiles; the score matrix never materializes in HBM;
  - MXU matmuls with fp32 accumulation (``preferred_element_type``);
  - 3D grid (batch*heads, q-blocks, k-blocks) with the k dimension
    "arbitrary" (sequential) so the denominator / output accumulator live
    in VMEM scratch across k steps;
  - a dedicated single-K-pass forward kernel for short sequences (the
    encoder / frame-attention regime, ~1370 tokens);
  - backward = two Pallas kernels (dq; dk+dv) using the saved log2-sum-exp
    — the standard FlashAttention-2 recomputation scheme.

VPU economy (at head_dim 64 the elementwise passes over the score matrix
cost as much as the MXU matmuls, so each pass counts):

  - **base-2 constant-shift softmax**: softmax(s) = 2^(s2-C) / sum 2^(s2-C)
    with s2 = s*log2(e). The temperature*log2(e) factor is folded into q
    outside the kernels and the shift -C into the additive bias row, so the
    kernels run a bare ``exp2`` on the scores — no row-max reduce, no
    max-subtract pass, and no online-max/alpha-rescale bookkeeping in the
    streaming kernel. fp32/bf16 carry the scale in the EXPONENT, so the
    normalized output is bit-comparable to the max-stabilized form as long
    as scaled logits stay within ~(C-150, C+127)*ln2 nats — (-83, +110) at
    C=32, far beyond trained attention logits (fp32 exp itself overflows
    at +88). Padding columns sit at -1e30 and exp2 to exactly 0.
  - K-padding is masked by ADDING a precomputed (1, tk_pad) bias row
    (-C for real columns, -1e30 for padding) instead of an in-kernel
    iota/compare/select — one VPU pass instead of three. Padded k/v rows
    are zeros, so they land at exactly -1e30-C and vanish.
  - backward: ln2 chain-rule factors (d/ds2 2^s2 = ln2*2^s2) are folded
    into ``do``/``delta`` outside the kernels (O(T*d) elementwise, fused
    by XLA); dv is unscaled once at the end. dk needs no correction: the
    kernel contracts ds2 with the pre-scaled q, and ln2*log2(e) = 1.

Sequence lengths are padded to block multiples. Padding/reshape/scale-fold
live outside the custom_vjp core so its residuals are pure arrays.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Tuned on TPU v5e at trunk-scale token counts inside jitted multi-layer
# stacks (scripts/bench_attention_blocks.py). Streaming default: (1024,
# 1024) wins the global regime (1x10953 tokens: 6.9 ms/layer, bk=1408/2048
# and bq=512/2048 all regress). Short sequences take the single-K-pass
# path chosen in ``flash_attention`` below.
DEFAULT_BLOCK_Q = 1024
DEFAULT_BLOCK_K = 1024
NEG_INF = -1e30
# Base-2 softmax shift: p = 2^(s2 - SHIFT2). Trades positive-logit
# headroom (overflow at (127+SHIFT2)*ln2 nats) against the all-rows-
# underflow point ((SHIFT2-150)*ln2 nats). 32 covers (-82, +110) nats.
SHIFT2 = 32.0
LOG2E = math.log2(math.e)
LN2 = math.log(2.0)


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------


def _fwd_kernel_single(q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref):
    """One K pass: constant-shift base-2 softmax, no reductions but the sum."""
    q = q_ref[0]  # (BQ, D), pre-scaled by temperature*log2(e)
    k = k_ref[0]  # (BK, D)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) + bias_ref[...]  # (BQ, BK) + (1, BK); bias folds in the -SHIFT2

    p = jnp.exp2(s)
    l = jnp.maximum(jnp.sum(p, axis=1, keepdims=True), 1e-37)

    v = v_ref[0]  # (BK, D)
    pv = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = (pv / l).astype(o_ref.dtype)
    # lse2 = log2(sum 2^(s2+bias)) stored with 128 duplicated lanes (TPU
    # tiling requires trailing block dims of (8k, 128); same layout as the
    # official jax.experimental.pallas.ops.tpu.flash_attention).
    lse_ref[0] = jnp.broadcast_to(jnp.log2(l), lse_ref.shape[1:])


def _fwd_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref, acc, l_scr):
    """Streaming kernel (k dimension sequential). The constant-shift base-2
    softmax needs no running max: the accumulator and denominator just add
    up across k steps — no alpha rescale pass."""
    j = pl.program_id(2)
    num_k = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        l_scr[:] = jnp.zeros_like(l_scr)
        acc[:] = jnp.zeros_like(acc)

    q = q_ref[0]  # (BQ, D), pre-scaled
    k = k_ref[0]  # (BK, D)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) + bias_ref[...]  # (BQ, BK) + (1, BK)

    p = jnp.exp2(s)
    l_scr[:] += jnp.broadcast_to(jnp.sum(p, axis=1, keepdims=True), l_scr.shape)

    v = v_ref[0]  # (BK, D)
    acc[:] += jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == num_k - 1)
    def _finish():
        l_final = jnp.maximum(l_scr[:, :1], 1e-37)
        o_ref[0] = (acc[:] / l_final).astype(o_ref.dtype)
        lse_ref[0] = jnp.broadcast_to(jnp.log2(l_final), lse_ref.shape[1:])


def _dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, bias_ref,
               dq_ref, dq_acc):
    j = pl.program_id(2)
    num_k = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        dq_acc[:] = jnp.zeros_like(dq_acc)

    q, k, v, do = q_ref[0], k_ref[0], v_ref[0], do_ref[0]
    lse = lse_ref[0][:, :1]       # log2-domain
    delta = delta_ref[0][:, :1]   # pre-scaled by ln2 outside

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) + bias_ref[...]
    p = jnp.exp2(s - lse)

    # do is pre-scaled by ln2 outside, so ds here is exactly dL/ds2.
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = p * (dp - delta)
    dq_acc[:] += jax.lax.dot_general(
        ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == num_k - 1)
    def _finish():
        dq_ref[0] = dq_acc[:].astype(dq_ref.dtype)


def _dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, bias_ref,
                dk_ref, dv_ref, dk_acc, dv_acc):
    i = pl.program_id(2)  # q-block index (sequential)
    num_q = pl.num_programs(2)

    @pl.when(i == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    q, k, v, do = q_ref[0], k_ref[0], v_ref[0], do_ref[0]
    lse = lse_ref[0][:, :1]       # log2-domain
    delta = delta_ref[0][:, :1]   # pre-scaled by ln2 outside

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) + bias_ref[...]
    p = jnp.exp2(s - lse)  # (BQ, BK)

    # do carries the ln2 chain-rule factor; dv is divided by ln2 outside.
    dv_acc[:] += jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = p * (dp - delta)  # dL/ds2
    # q is pre-scaled by temperature*log2(e) and ds by ln2, which cancel
    # into the standard temperature-scaled dk.
    dk_acc[:] += jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(i == num_q - 1)
    def _finish():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


# ---------------------------------------------------------------------------
# Core (custom VJP over padded (BH, T, D) arrays; all sizes static)
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _flash_core(q3, k3, v3, bias, block_q, block_k, interpret=False):
    o, _ = _core_fwd(q3, k3, v3, bias, block_q, block_k, interpret)
    return o


def _core_fwd(q3, k3, v3, bias, block_q, block_k, interpret=False):
    bh, tq, d = q3.shape
    tk = k3.shape[1]
    num_k = tk // block_k
    out_shape = [
        jax.ShapeDtypeStruct((bh, tq, d), q3.dtype),
        jax.ShapeDtypeStruct((bh, tq, 128), jnp.float32),
    ]
    if num_k == 1:
        o, lse = pl.pallas_call(
            _fwd_kernel_single,
            grid=(bh, tq // block_q),
            in_specs=[
                pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0)),
                pl.BlockSpec((1, block_k, d), lambda b, i: (b, 0, 0)),
                pl.BlockSpec((1, block_k, d), lambda b, i: (b, 0, 0)),
                pl.BlockSpec((1, block_k), lambda b, i: (0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0)),
                pl.BlockSpec((1, block_q, 128), lambda b, i: (b, i, 0)),
            ],
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
            ),
            interpret=interpret,
        )(q3, k3, v3, bias)
    else:
        o, lse = pl.pallas_call(
            _fwd_kernel,
            grid=(bh, tq // block_q, num_k),
            in_specs=[
                pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
                pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
                pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
                pl.BlockSpec((1, block_k), lambda b, i, j: (0, j)),
            ],
            out_specs=[
                pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
                pl.BlockSpec((1, block_q, 128), lambda b, i, j: (b, i, 0)),
            ],
            out_shape=out_shape,
            scratch_shapes=[
                pltpu.VMEM((block_q, d), jnp.float32),
                pltpu.VMEM((block_q, 128), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
            interpret=interpret,
        )(q3, k3, v3, bias)
    # The kernel writes identical values to all 128 lse lanes (TPU tiling).
    # Keep ONE lane as the backward residual: in a 24-layer trained model
    # the full (bh, tq, 128) fp32 buffers otherwise dominate saved
    # activations (~48 MB/layer at 8-view 518 px).
    return o, (q3, k3, v3, bias, o, lse[..., 0])


def _bwd_block(t_pad: int, cap: int = 1024) -> int:
    """Largest 64-multiple divisor of ``t_pad`` that is <= cap.

    The backward kernels hold a (block_q, block_k) score matrix PLUS dq/dkv
    accumulators in VMEM; the big single-K-pass forward blocks (up to
    2048x2048) overflow the 16 MB budget there (observed: 17.5 MB at
    (1408, 1536) in the dkv kernel). Backward re-blocks the same padded
    arrays, so the block must divide the padded length.
    """
    best = 128
    for b in range(64, cap + 1, 64):
        if t_pad % b == 0:
            best = b
    return best


def _core_bwd(block_q, block_k, interpret, res, g3):
    q3, k3, v3, bias, o3, lse_1 = res
    bh, tq, d = q3.shape
    tk_pad = k3.shape[1]
    block_q = _bwd_block(tq, min(block_q, 1024))
    block_k = _bwd_block(tk_pad, min(block_k, 1024))

    lse = jnp.broadcast_to(lse_1[..., None], (bh, tq, 128))
    # Fold the d(2^x)/dx = ln2 * 2^x chain-rule factor into do and delta
    # here (O(T*d) elementwise, fused by XLA) instead of an extra (BQ, BK)
    # VPU pass inside the kernels; dv is unscaled once at the end.
    g3s = (g3.astype(jnp.float32) * LN2).astype(g3.dtype)
    delta = jnp.sum(
        g3s.astype(jnp.float32) * o3.astype(jnp.float32), axis=-1
    )  # (BH, Tq)
    delta = jnp.broadcast_to(delta[..., None], (*delta.shape, 128))

    dq3 = pl.pallas_call(
        _dq_kernel,
        grid=(bh, tq // block_q, tk_pad // block_k),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_q, 128), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_q, 128), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_k), lambda b, i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, tq, d), q3.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q3, k3, v3, g3s, lse, delta, bias)

    dk3, dv3 = pl.pallas_call(
        _dkv_kernel,
        grid=(bh, tk_pad // block_k, tq // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, j, i: (b, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, block_q, d), lambda b, j, i: (b, i, 0)),
            pl.BlockSpec((1, block_q, 128), lambda b, j, i: (b, i, 0)),
            pl.BlockSpec((1, block_q, 128), lambda b, j, i: (b, i, 0)),
            pl.BlockSpec((1, block_k), lambda b, j, i: (0, j)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, tk_pad, d), k3.dtype),
            jax.ShapeDtypeStruct((bh, tk_pad, d), v3.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q3, k3, v3, g3s, lse, delta, bias)

    dv3 = (dv3.astype(jnp.float32) * (1.0 / LN2)).astype(dv3.dtype)
    return dq3, dk3, dv3, jnp.zeros_like(bias)


def _core_fwd_rule(q3, k3, v3, bias, block_q, block_k, interpret=False):
    return _core_fwd(q3, k3, v3, bias, block_q, block_k, interpret)


_flash_core.defvjp(_core_fwd_rule, _core_bwd)


# ---------------------------------------------------------------------------
# Public wrapper
# ---------------------------------------------------------------------------


def _pad_to(n: int, m: int) -> int:
    return (n + m - 1) // m * m


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: Optional[float] = None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    interpret: bool = False,
) -> jnp.ndarray:
    """Flash attention over (B, T, H, D) tensors (non-causal, full).

    Drop-in replacement for ``jax.nn.dot_product_attention`` on TPU.
    """
    b, tq, h, d = q.shape
    tk = k.shape[1]
    if scale is None:
        scale = d**-0.5

    # Block selection, tuned on the v5e at the model's attention regimes
    # (scripts/bench_attention_blocks.py, 12-layer scans inside one jit):
    #
    #   - SHORT sequences (pad(tk,512) <= 2048, i.e. the encoder/frame
    #     regime at ~1370 tokens): one single K pass with bk = pad(tk,512)
    #     and one (or two) big q steps; Mosaic strongly prefers
    #     512-multiple K blocks (bk=1536 beats bk=1408 despite more
    #     padding). Measured (before the single-pass kernel): encoder
    #     8x1370 h16 3.57 -> 2.45 ms, frame 8x1369 h12 2.55 -> 1.98 ms
    #     per layer at (bq, bk) = (1408, 1536).
    #   - LONG sequences (the global regime, V*H*W+1 tokens): streaming
    #     (1024, 1024) blocks win (6.86 ms at 1x10953 h12, 53.7 TFLOP/s;
    #     bk=1408/2048 and bq=512/2048 all regress).
    if (
        block_q == DEFAULT_BLOCK_Q
        and block_k == DEFAULT_BLOCK_K
        and _pad_to(tk, 512) <= 2048
    ):
        bk = _pad_to(tk, 512)
        bq = min(_pad_to(tq, 128), 2048)
    else:
        bq = min(block_q, _pad_to(tq, 128))
        bk = min(block_k, _pad_to(tk, 128))
        bk = max(bk, min(512, _pad_to(tk, 128)))
    tq_pad = _pad_to(tq, bq)
    tk_pad = _pad_to(tk, bk)

    # Fold temperature AND the base-2 conversion into q (one (tq, d)
    # multiply instead of (tq, tk) passes inside every kernel; gradients
    # flow through it, supplying the log2(e) half of the backward's
    # ln2 * log2(e) = 1 cancellation).
    q = q * jnp.asarray(scale * LOG2E, q.dtype)

    # Additive K-bias row: -SHIFT2 (the constant-shift softmax) on real
    # columns, -inf on padding.
    col = jnp.arange(tk_pad)
    bias = jnp.where(col < tk, -SHIFT2, NEG_INF).astype(jnp.float32)[None, :]

    def to3(x, t_pad):
        x = jnp.swapaxes(x, 1, 2).reshape(b * h, x.shape[1], d)
        if x.shape[1] != t_pad:
            x = jnp.pad(x, ((0, 0), (0, t_pad - x.shape[1]), (0, 0)))
        return x

    o3 = _flash_core(
        to3(q, tq_pad), to3(k, tk_pad), to3(v, tk_pad),
        bias, bq, bk, interpret,
    )
    return o3[:, :tq].reshape(b, h, tq, d).swapaxes(1, 2)
