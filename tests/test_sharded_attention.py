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


def test_ring_gradients_pallas_kernel(mesh):
    """Differentiated ring with the PRODUCTION per-step backward: token
    counts >=128/shard so _ring_block_bwd routes through the Pallas FA-2
    dq / dk+dv kernels (interpret mode on CPU), not the einsum fallback
    (VERDICT r2 item 3)."""
    rng = np.random.RandomState(3)
    B, T, H, D = 1, 512, 2, 64  # 4 view shards x 128 tokens
    q = jnp.asarray(rng.randn(B, T, H, D).astype(np.float32))
    k = jnp.asarray(rng.randn(B, T, H, D).astype(np.float32))
    v = jnp.asarray(rng.randn(B, T, H, D).astype(np.float32))
    scale = D ** -0.5

    def loss_ring(q, k, v):
        return jnp.sum(
            ring_attention(
                q, k, v, mesh, scale=scale, backend="pallas_interpret"
            ) ** 2
        )

    def loss_ref(q, k, v):
        return jnp.sum(reference(q, k, v, scale) ** 2)

    g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_ring, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-3, err_msg=f"d{name}"
        )


class TestGlobalAttentionCPRingGrads:
    """global_attention_cp(schedule='ring') is differentiable — the
    >200-view training path (VERDICT r2 item 3 'make ring differentiable')."""

    def _data(self, T=256, E=2, seed=4, H=2, D=64):
        rng = np.random.RandomState(seed)
        B = 1
        mk = lambda t: jnp.asarray(rng.randn(B, t, H, D).astype(np.float32))
        return (mk(T), mk(T), mk(T), mk(E), mk(E), mk(E))

    def _dense(self, qg, kg, vg, qe, ke, ve, scale):
        q = jnp.concatenate([qg, qe], 1)
        k = jnp.concatenate([kg, ke], 1)
        v = jnp.concatenate([vg, ve], 1)
        o = reference(q, k, v, scale)
        g = qg.shape[1]
        return o[:, :g], o[:, g:]

    @pytest.mark.parametrize("backend", ["einsum", "pallas_interpret"])
    def test_ring_extra_grads_match_dense(self, mesh, backend):
        from mapanything_tpu.parallel.sharded_attention import (
            global_attention_cp,
        )

        T = 512 if backend == "pallas_interpret" else 256
        args = self._data(T=T)
        scale = args[0].shape[-1] ** -0.5

        def loss_ring(*a):
            og, oe = global_attention_cp(
                *a, mesh=mesh, scale=scale, schedule="ring", backend=backend
            )
            return jnp.sum(og ** 2) + jnp.sum(oe ** 2)

        def loss_dense(*a):
            og, oe = self._dense(*a, scale)
            return jnp.sum(og ** 2) + jnp.sum(oe ** 2)

        got = jax.grad(loss_ring, argnums=tuple(range(6)))(*args)
        want = jax.grad(loss_dense, argnums=tuple(range(6)))(*args)
        for a, b, name in zip(got, want, ["qg", "kg", "vg", "qe", "ke", "ve"]):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-3, err_msg=f"d{name}"
            )

    def test_ring_extra_forward_matches_dense(self, mesh):
        from mapanything_tpu.parallel.sharded_attention import (
            global_attention_cp,
        )

        args = self._data(T=256, seed=9)
        scale = 0.15
        og, oe = global_attention_cp(
            *args, mesh=mesh, scale=scale, schedule="ring", backend="einsum"
        )
        wg, we = self._dense(*args, scale)
        np.testing.assert_allclose(np.asarray(og), np.asarray(wg), atol=2e-5)
        np.testing.assert_allclose(np.asarray(oe), np.asarray(we), atol=2e-5)
