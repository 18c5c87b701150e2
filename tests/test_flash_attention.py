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


if __name__ == "__main__":
    pytest.main([__file__, "-q", "-x"])
