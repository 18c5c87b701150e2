"""Context-parallel attention vs unsharded reference on the CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mapanything_tpu.parallel.mesh import make_mesh
from mapanything_tpu.parallel.sharded_attention import (
    allgather_kv_attention,
    ring_attention,
)


def reference(q, k, v, scale):
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
    w = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", w, v)


@pytest.fixture(scope="module")
def qkv():
    rng = np.random.RandomState(0)
    B, T, H, D = 2, 64, 2, 32
    q = jnp.asarray(rng.randn(B, T, H, D).astype(np.float32))
    k = jnp.asarray(rng.randn(B, T, H, D).astype(np.float32))
    v = jnp.asarray(rng.randn(B, T, H, D).astype(np.float32))
    return q, k, v


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(jax.devices()[:8], view_parallelism=4)


def test_allgather_matches_reference(qkv, mesh):
    q, k, v = qkv
    out = allgather_kv_attention(q, k, v, mesh, scale=0.18)
    ref = reference(q, k, v, 0.18)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_ring_matches_reference(qkv, mesh):
    q, k, v = qkv
    out = ring_attention(q, k, v, mesh, scale=0.18)
    ref = reference(q, k, v, 0.18)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_ring_gradients_flow(qkv, mesh):
    q, k, v = qkv

    def loss_ring(q, k, v):
        return jnp.sum(ring_attention(q, k, v, mesh, scale=0.18) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(reference(q, k, v, 0.18) ** 2)

    g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_ring, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, err_msg=f"d{name}"
        )


if __name__ == "__main__":
    pytest.main([__file__, "-q", "-x"])


def test_ring_pallas_kernel_matches_reference(qkv, mesh):
    """The production per-step kernel (Pallas, interpreter mode on CPU)
    merges identically to the einsum path."""
    q, k, v = qkv
    out = ring_attention(
        q, k, v, mesh, scale=0.18, backend="pallas_interpret"
    )
    ref = reference(q, k, v, 0.18)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
