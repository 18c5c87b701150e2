"""Flash-attention kernel vs XLA reference (interpreter mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from mapanything_tpu.ops.flash_attention import flash_attention


def reference_sdpa(q, k, v, scale):
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
    w = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", w, v)


def make_qkv(b=1, tq=128, tk=128, h=1, d=64, seed=0):
    rng = np.random.RandomState(seed)
    q = jnp.asarray(rng.randn(b, tq, h, d).astype(np.float32))
    k = jnp.asarray(rng.randn(b, tk, h, d).astype(np.float32))
    v = jnp.asarray(rng.randn(b, tk, h, d).astype(np.float32))
    return q, k, v


@pytest.mark.parametrize("tq,tk", [(128, 128), (160, 160), (128, 256)])
def test_forward_matches_reference(tq, tk):
    q, k, v = make_qkv(tq=tq, tk=tk)
    scale = 0.125
    out = flash_attention(q, k, v, scale, 128, 128, interpret=True)
    ref = reference_sdpa(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("tq,tk", [(300, 300), (600, 300), (130, 700)])
def test_forward_auto_blocks_single_k_pass(tq, tk):
    # Default block args route short sequences to the single-K-pass config
    # (bk = pad(tk,512) > pad(tk,128), bq = pad(tq,128)) — cover both pads.
    q, k, v = make_qkv(tq=tq, tk=tk)
    scale = 0.125
    out = flash_attention(q, k, v, scale, interpret=True)
    ref = reference_sdpa(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_backward_auto_blocks_single_k_pass():
    q, k, v = make_qkv(tq=300, tk=300)
    scale = 0.125

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, scale, interpret=True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(reference_sdpa(q, k, v, scale) ** 2)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_flash, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, err_msg=f"d{name}"
        )


def test_backward_matches_reference():
    q, k, v = make_qkv(tq=128, tk=128)
    scale = 0.125

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, scale, 128, 128, interpret=True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(reference_sdpa(q, k, v, scale) ** 2)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_flash, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, err_msg=f"d{name}"
        )


def test_backward_padded_lengths():
    q, k, v = make_qkv(tq=100, tk=100)
    scale = 0.125

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, scale, 128, 128, interpret=True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(reference_sdpa(q, k, v, scale) ** 2)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_flash, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, err_msg=f"d{name}"
        )


def test_backward_bf16_within_half_precision_roundoff():
    """bf16 flash backward (the trunk's training configuration: bf16
    inputs, fp32 kernel accumulation) vs exact fp32 grads — VERDICT r3
    item 3's tolerance check. The acceptance bar is XLA's own bf16
    attention backward against the same fp32 reference: the kernel must
    not be (materially) less accurate than the bf16 format itself.
    """
    q, k, v = make_qkv(tq=300, tk=300)
    scale = 0.125
    qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, scale, interpret=True)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    def loss_ref(q, k, v):
        o = reference_sdpa(q, k, v, scale)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    g_exact = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_flash16 = jax.grad(loss_flash, argnums=(0, 1, 2))(qb, kb, vb)
    g_xla16 = jax.grad(loss_ref, argnums=(0, 1, 2))(qb, kb, vb)

    for gf, gx, ge, name in zip(g_flash16, g_xla16, g_exact, "qkv"):
        err_flash = float(jnp.max(jnp.abs(gf.astype(jnp.float32) - ge)))
        err_xla = float(jnp.max(jnp.abs(gx.astype(jnp.float32) - ge)))
        scale_mag = float(jnp.max(jnp.abs(ge)))
        assert err_flash <= max(2.0 * err_xla, 1e-2 * scale_mag), (
            f"d{name}: bf16 flash bwd err {err_flash:.3e} vs "
            f"bf16 XLA bwd err {err_xla:.3e} (|g|max {scale_mag:.3e})"
        )


class TestDispatch:
    """Invariants of the kernel dispatcher (packed / 3D / streaming)."""

    def test_packed_plan_blocks_divide_padded_length(self):
        from mapanything_tpu.ops.flash_attention import _packed_plan

        for tq in (100, 518, 1369, 1370, 2048):
            plan = _packed_plan(tq, tq, 256, 2, limit_bytes=1 << 40)
            assert plan is not None
            bq, tq_pad = plan
            assert tq_pad >= tq and tq_pad % bq == 0 and bq % 8 == 0

    def test_packed_head_chunk(self):
        from mapanything_tpu.ops.flash_attention import _packed_head_chunk

        assert _packed_head_chunk(16, 64) == 8   # 512-channel window
        assert _packed_head_chunk(12, 64) == 6
        assert _packed_head_chunk(16, 128) == 4
        assert _packed_head_chunk(7, 64) is None   # no even divisor
        assert _packed_head_chunk(2, 48) is None   # 96 lanes, not 128-mult

    def test_use_packed_regimes(self):
        from mapanything_tpu.ops.flash_attention import _use_packed

        q = jnp.zeros((1, 1370, 16, 64), jnp.bfloat16)
        assert _use_packed(q, q, interpret=False)          # encoder regime
        qf = jnp.zeros((1, 1370, 16, 64), jnp.float32)
        assert not _use_packed(qf, qf, interpret=False)    # fp32 -> 3D
        assert _use_packed(qf, qf, interpret=True)         # tests cover it
        qlong = jnp.zeros((1, 10953, 12, 64), jnp.bfloat16)
        assert not _use_packed(qlong, qlong, interpret=False)  # streaming
        qodd = jnp.zeros((1, 1370, 7, 64), jnp.bfloat16)
        assert not _use_packed(qodd, qodd, interpret=False)  # no head chunk

    def test_packed_multi_head_chunks_match_reference(self):
        # h=4, d=64 -> hc=4 single chunk; h=8 -> hc=8; exercise hc<h via
        # d=128 (hc capped at 4 channels windows of 512).
        q, k, v = make_qkv(tq=300, tk=300, h=8, d=64)
        out = flash_attention(q, k, v, 0.125, interpret=True)
        ref = reference_sdpa(q, k, v, 0.125)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

        q, k, v = make_qkv(tq=200, tk=200, h=8, d=128)
        out = flash_attention(q, k, v, 0.08, interpret=True)
        ref = reference_sdpa(q, k, v, 0.08)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_streaming_long_regime_fwd_bwd(self):
        # pad(tk,512) > 2048 forces the streaming (augmented-column)
        # kernels even with default blocks.
        q, k, v = make_qkv(tq=2100, tk=2100, h=2, d=64)
        scale = 0.125
        out = flash_attention(q, k, v, scale, interpret=True)
        ref = reference_sdpa(q, k, v, scale)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

        def loss_flash(q, k, v):
            return jnp.sum(flash_attention(q, k, v, scale, interpret=True) ** 2)

        def loss_ref(q, k, v):
            return jnp.sum(reference_sdpa(q, k, v, scale) ** 2)

        g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b, name in zip(g_flash, g_ref, "qkv"):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-3, err_msg=f"d{name}"
            )


class TestPairPacking:
    """Head-pair packed long-regime primal (round 5): two d=64 heads per
    grid row with block-diagonal K/V, full 128-lane MXU contraction."""

    def test_use_pair_regimes(self):
        from mapanything_tpu.ops.flash_attention import _use_pair

        qlong = jnp.zeros((1, 4096, 4, 64), jnp.bfloat16)
        qshort = jnp.zeros((1, 1370, 4, 64), jnp.bfloat16)
        qodd = jnp.zeros((1, 4096, 3, 64), jnp.bfloat16)
        qd32 = jnp.zeros((1, 4096, 4, 32), jnp.bfloat16)
        qf32 = jnp.zeros((1, 4096, 4, 64), jnp.float32)
        qhuge = jnp.zeros((1, 87617, 4, 64), jnp.bfloat16)
        assert _use_pair(qlong, qlong, interpret=False)
        assert not _use_pair(qshort, qshort, interpret=False)  # short regime
        assert not _use_pair(qodd, qodd, interpret=False)  # odd heads
        assert not _use_pair(qd32, qd32, interpret=False)  # d != 64
        assert not _use_pair(qf32, qf32, interpret=False)  # fp32 VMEM
        assert _use_pair(qf32, qf32, interpret=True)  # tests cover it
        # very-long (many-view) regime stays on the aug streaming kernel:
        # model-level 64-view regression despite the standalone kernel win
        assert not _use_pair(qhuge, qhuge, interpret=False)

    def test_pair_forward_matches_reference(self):
        from mapanything_tpu.ops.flash_attention import _pair_forward

        # 4 heads, unpadded-length + padded-length variants
        for tq in (2100, 2048):
            q, k, v = make_qkv(tq=tq, tk=tq, h=4, d=64, seed=3)
            out = _pair_forward(q, k, v, 0.125, 1024, 1024, True)
            ref = reference_sdpa(q, k, v, 0.125)
            np.testing.assert_allclose(
                np.asarray(out), np.asarray(ref), atol=2e-5
            )

    def test_pair_backward_matches_reference(self):
        # default dispatch at long-regime d=64 even heads routes fwd+bwd
        # through the pair kernels; gradients must match XLA per head
        q, k, v = make_qkv(tq=2100, tk=2100, h=4, d=64, seed=5)
        scale = 0.125

        def loss_flash(q, k, v):
            return jnp.sum(flash_attention(q, k, v, scale, interpret=True) ** 2)

        def loss_ref(q, k, v):
            return jnp.sum(reference_sdpa(q, k, v, scale) ** 2)

        g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b, name in zip(g_flash, g_ref, "qkv"):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-3, err_msg=f"d{name}"
            )

    def test_pair_head_content_not_mixed(self):
        # distinct per-head content must stay per-head through the packing
        from mapanything_tpu.ops.flash_attention import _pair_forward

        q, k, v = make_qkv(tq=2100, tk=2100, h=2, d=64, seed=4)
        # make head 1's v wildly different
        v = v.at[:, :, 1, :].set(v[:, :, 1, :] * 100.0 + 5.0)
        out = _pair_forward(q, k, v, 0.125, 1024, 1024, True)
        ref = reference_sdpa(q, k, v, 0.125)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-3
        )


if __name__ == "__main__":
    pytest.main([__file__, "-q", "-x"])


def test_lse_variant_matches_reference():
    """flash_attention_lse returns the exact output AND the natural-log
    normalizer of the scaled logits (the ring-attention merge residual)."""
    from mapanything_tpu.ops.flash_attention import flash_attention_lse

    rng = np.random.RandomState(11)
    B, T, H, D = 1, 192, 2, 64
    q = jnp.asarray(rng.randn(B, T, H, D).astype(np.float32))
    k = jnp.asarray(rng.randn(B, T, H, D).astype(np.float32))
    v = jnp.asarray(rng.randn(B, T, H, D).astype(np.float32))
    scale = 0.17

    o, lse = flash_attention_lse(q, k, v, scale, 128, 128, interpret=True)

    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
    ref_o = jnp.einsum(
        "bhqk,bkhd->bqhd", jax.nn.softmax(logits, axis=-1), v
    )
    ref_lse = jax.scipy.special.logsumexp(logits, axis=-1)
    np.testing.assert_allclose(np.asarray(o), np.asarray(ref_o), atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(lse), np.asarray(ref_lse), atol=2e-5
    )


def test_block_bwd_vs_global_lse_matches_dense_grads():
    """flash_attention_bwd_lse: FA-2 per-block backward against a GLOBAL
    lse. Splitting the KV set into blocks, running the helper per block,
    and summing dq must reproduce dense-attention gradients; dk/dv land
    per block. This is the ring backward's building block."""
    from mapanything_tpu.ops.flash_attention import (
        flash_attention_bwd_lse,
        flash_attention_lse,
    )

    b, tq, tk, h, d = 1, 160, 384, 2, 64
    scale = d ** -0.5
    q, k, v = make_qkv(b, tq, tk, h, d, seed=5)
    rng = np.random.RandomState(6)
    do = jnp.asarray(rng.randn(b, tq, h, d).astype(np.float32))

    # dense reference grads
    def loss(q, k, v):
        return jnp.sum(reference_sdpa(q, k, v, scale) * do)

    want_dq, want_dk, want_dv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    # global o/lse via the kernel (whole KV in one call)
    o, lse = flash_attention_lse(q, k, v, scale, 128, 128, interpret=True)

    # per-block backward: 3 blocks of 128
    dq_total = jnp.zeros_like(q)
    dks, dvs = [], []
    for j in range(3):
        sl = slice(j * 128, (j + 1) * 128)
        dq_p, dk_b, dv_b = flash_attention_bwd_lse(
            q, k[:, sl], v[:, sl], o, lse, do, scale=scale,
            block_q=128, block_k=128, interpret=True,
        )
        dq_total = dq_total + dq_p
        dks.append(dk_b)
        dvs.append(dv_b)
    dk_total = jnp.concatenate(dks, axis=1)
    dv_total = jnp.concatenate(dvs, axis=1)

    np.testing.assert_allclose(np.asarray(dq_total), np.asarray(want_dq),
                               atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(dk_total), np.asarray(want_dk),
                               atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(dv_total), np.asarray(want_dv),
                               atol=2e-4, rtol=2e-4)


def test_block_bwd_vs_global_lse_unpadded_lengths():
    """Same check at lengths requiring padding inside the helper."""
    from mapanything_tpu.ops.flash_attention import (
        flash_attention_bwd_lse,
        flash_attention_lse,
    )

    b, tq, tk, h, d = 1, 150, 280, 2, 64
    scale = d ** -0.5
    q, k, v = make_qkv(b, tq, tk, h, d, seed=7)
    rng = np.random.RandomState(8)
    do = jnp.asarray(rng.randn(b, tq, h, d).astype(np.float32))

    def loss(q, k, v):
        return jnp.sum(reference_sdpa(q, k, v, scale) * do)

    want_dq, want_dk, want_dv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    o, lse = flash_attention_lse(q, k, v, scale, 128, 128, interpret=True)

    split = 140
    dq1, dk1, dv1 = flash_attention_bwd_lse(
        q, k[:, :split], v[:, :split], o, lse, do, scale=scale,
        block_q=128, block_k=128, interpret=True,
    )
    dq2, dk2, dv2 = flash_attention_bwd_lse(
        q, k[:, split:], v[:, split:], o, lse, do, scale=scale,
        block_q=128, block_k=128, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(dq1 + dq2), np.asarray(want_dq),
                               atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(
        np.asarray(jnp.concatenate([dk1, dk2], axis=1)), np.asarray(want_dk),
        atol=2e-4, rtol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(jnp.concatenate([dv1, dv2], axis=1)), np.asarray(want_dv),
        atol=2e-4, rtol=2e-4,
    )
