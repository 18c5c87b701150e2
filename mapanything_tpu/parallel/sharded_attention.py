"""Explicit context-parallel attention over the view mesh axis.

Two schedules for the trunk's global-attention layers when V*P tokens are
sharded across the "view" axis (SURVEY.md 2.5 — the TPU contribution
replacing the reference's single-GPU full attention):

  - ``allgather_kv_attention``: each shard all-gathers K/V over ICI and
    attends its local queries to the full sequence. One collective per
    layer, O(T) KV memory per chip, O(T/n) activations. The robust default
    (XLA's automatic SPMD choice, made explicit and controllable here).

  - ``ring_attention``: K/V shards rotate around the ring with
    ``jax.lax.ppermute`` while each chip accumulates online-softmax partial
    results — O(T/n) memory per chip and communication overlapped with
    compute by XLA's async collective scheduling. This is the >500-view
    path of BASELINE.json; per-step attention uses the Pallas flash kernel
    via ops.attention.sdpa.

Both are implemented with ``shard_map`` and validated against unsharded
attention on the virtual CPU mesh (tests/test_sharded_attention.py).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from mapanything_tpu.ops.attention import sdpa
from mapanything_tpu.parallel.mesh import VIEW_AXIS


def allgather_kv_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    scale: Optional[float] = None,
    axis: str = VIEW_AXIS,
) -> jnp.ndarray:
    """Attention with tokens sharded over ``axis``; KV all-gathered.

    Args:
        q/k/v: (B, T, H, D) with T divisible by the axis size.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5

    def body(q_local, k_local, v_local):
        k_full = jax.lax.all_gather(k_local, axis, axis=1, tiled=True)
        v_full = jax.lax.all_gather(v_local, axis, axis=1, tiled=True)
        return sdpa(q_local, k_full, v_full, scale=scale, implementation="xla")

    spec = P(None, axis, None, None)
    return shard_map(
        body, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
    )(q, k, v)


def ring_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    scale: Optional[float] = None,
    axis: str = VIEW_AXIS,
) -> jnp.ndarray:
    """Ring attention: KV shards rotate via ppermute, online-softmax merge.

    O(T/n) memory per chip; ICI transfers overlap with per-step attention.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    n = mesh.shape[axis]

    def body(q_local, k_local, v_local):
        bt = q_local.shape
        perm = [(i, (i + 1) % n) for i in range(n)]

        def step(carry, _):
            k_cur, v_cur, m_acc, l_acc, o_acc = carry
            # Per-block attention statistics (fp32 math).
            logits = jnp.einsum(
                "bqhd,bkhd->bhqk", q_local.astype(jnp.float32),
                k_cur.astype(jnp.float32),
            ) * scale
            m_blk = jnp.max(logits, axis=-1)  # (B, H, Tq)
            p = jnp.exp(logits - m_blk[..., None])
            l_blk = jnp.sum(p, axis=-1)
            o_blk = jnp.einsum("bhqk,bkhd->bqhd", p, v_cur.astype(jnp.float32))

            m_new = jnp.maximum(m_acc, m_blk)
            alpha = jnp.exp(m_acc - m_new)
            beta = jnp.exp(m_blk - m_new)
            l_new = l_acc * alpha + l_blk * beta
            o_new = (
                o_acc * alpha.transpose(0, 2, 1)[..., None]
                + o_blk * beta.transpose(0, 2, 1)[..., None]
            )
            # Rotate KV around the ring.
            k_nxt = jax.lax.ppermute(k_cur, axis, perm)
            v_nxt = jax.lax.ppermute(v_cur, axis, perm)
            return (k_nxt, v_nxt, m_new, l_new, o_new), None

        b, tq, h, d = q_local.shape
        # pcast marks the accumulators as device-varying over the ring axis
        # so the scan carry type stays consistent after the first ppermute.
        m0 = jax.lax.pcast(jnp.full((b, h, tq), -jnp.inf, jnp.float32), (axis,), to='varying')
        l0 = jax.lax.pcast(jnp.zeros((b, h, tq), jnp.float32), (axis,), to='varying')
        o0 = jax.lax.pcast(jnp.zeros((b, tq, h, d), jnp.float32), (axis,), to='varying')
        (k_f, v_f, m_f, l_f, o_f), _ = jax.lax.scan(
            step, (k_local.astype(jnp.float32), v_local.astype(jnp.float32), m0, l0, o0),
            None, length=n,
        )
        out = o_f / jnp.maximum(l_f, 1e-30).transpose(0, 2, 1)[..., None]
        return out.astype(q_local.dtype)

    spec = P(None, axis, None, None)
    return shard_map(
        body, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
    )(q, k, v)
