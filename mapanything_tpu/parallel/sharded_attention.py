"""Explicit context-parallel attention over the view mesh axis.

Two schedules for the trunk's global-attention layers when V*P tokens are
sharded across the "view" axis (SURVEY.md 2.5 — the TPU contribution
replacing the reference's single-GPU full attention,
uniception/models/utils/transformer_blocks.py:186-199):

  - ``allgather_kv_attention``: each shard all-gathers K/V over ICI and
    attends its local queries to the full sequence with the Pallas flash
    kernel. One collective per layer, O(T) KV memory per chip, O(T/n)
    activations. The robust default.

  - ``ring_attention``: K/V shards rotate around the ring with
    ``jax.lax.ppermute`` while each chip merges per-shard flash-attention
    partials via their log-sum-exp — O(T/n) memory per chip, ICI transfers
    overlapped with the per-step kernel by XLA's async collective
    scheduling. Each step IS the Pallas flash kernel
    (``ops.flash_attention.flash_attention_lse``); the backward pass is a
    ring-level custom VJP (FlashAttention-2 style recomputation per KV
    block, gradients rotating home with their shards).

Both are implemented with ``shard_map`` and validated against unsharded
attention — values and gradients — on the virtual CPU mesh
(tests/test_sharded_attention.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from mapanything_tpu.ops.attention import sdpa
from mapanything_tpu.parallel.mesh import VIEW_AXIS


def _use_pallas() -> bool:
    return jax.default_backend() not in ("cpu",)


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
    impl = "pallas" if _use_pallas() else "xla"

    def body(q_local, k_local, v_local):
        k_full = jax.lax.all_gather(k_local, axis, axis=1, tiled=True)
        v_full = jax.lax.all_gather(v_local, axis, axis=1, tiled=True)
        return sdpa(q_local, k_full, v_full, scale=scale, implementation=impl)

    spec = P(None, axis, None, None)
    return shard_map(
        body, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
    )(q, k, v)


# ---------------------------------------------------------------------------
# Ring attention
# ---------------------------------------------------------------------------


def _block_attn_lse(q, k_blk, v_blk, scale, backend):
    """(o, lse) of q attending one KV block. o fp32 (B, Tq, H, D);
    lse fp32 (B, H, Tq), natural log of the scaled-logit normalizer."""
    if q.shape[1] < 128 or k_blk.shape[1] < 128:
        backend = "einsum"  # kernel block padding dwarfs tiny token groups
    if backend.startswith("pallas"):
        from mapanything_tpu.ops.flash_attention import flash_attention_lse

        o, lse = flash_attention_lse(
            q, k_blk, v_blk, scale=scale,
            interpret=backend == "pallas_interpret",
        )
        return o.astype(jnp.float32), lse
    logits = (
        jnp.einsum(
            "bqhd,bkhd->bhqk",
            q.astype(jnp.float32),
            k_blk.astype(jnp.float32),
        )
        * scale
    )
    m = jnp.max(logits, axis=-1)
    p = jnp.exp(logits - m[..., None])
    l = jnp.sum(p, axis=-1)
    o = jnp.einsum("bhqk,bkhd->bqhd", p, v_blk.astype(jnp.float32))
    o = o / jnp.maximum(l, 1e-30).transpose(0, 2, 1)[..., None]
    return o, m + jnp.log(jnp.maximum(l, 1e-30))


def _bhq_to_bqh1(x):
    return x.transpose(0, 2, 1)[..., None]


def _pcast(x, axis):
    # Under check_vma=False shard_map, pcast is unnecessary (and invalid);
    # keep it a no-op there.
    del axis
    return x


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _ring_shard(q, k, v, scale, axis, n, backend):
    o, _ = _ring_fwd_pass(q, k, v, scale, axis, n, backend)
    return o


def _ring_fwd_pass(q, k, v, scale, axis, n, backend):
    """Scan the ring: per-step flash(+lse) on the current KV shard, exact
    online merge through log-sum-exp. Returns (o, lse_global)."""
    perm = [(i, (i + 1) % n) for i in range(n)]
    b, tq, h, d = q.shape

    def step(carry, _):
        k_cur, v_cur, lse_acc, o_acc = carry
        o_blk, lse_blk = _block_attn_lse(q, k_cur, v_cur, scale, backend)
        lse_new = jnp.logaddexp(lse_acc, lse_blk)
        o_new = o_acc * _bhq_to_bqh1(jnp.exp(lse_acc - lse_new)) + o_blk * (
            _bhq_to_bqh1(jnp.exp(lse_blk - lse_new))
        )
        k_nxt = jax.lax.ppermute(k_cur, axis, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis, perm)
        return (k_nxt, v_nxt, lse_new, o_new), None

    lse0 = _pcast(jnp.full((b, h, tq), -jnp.inf, jnp.float32), axis)
    o0 = _pcast(jnp.zeros((b, tq, h, d), jnp.float32), axis)
    (k_f, v_f, lse_f, o_f), _ = jax.lax.scan(
        step, (k, v, lse0, o0), None, length=n
    )
    return o_f.astype(q.dtype), lse_f


def _ring_fwd_rule(q, k, v, scale, axis, n, backend):
    o, lse = _ring_fwd_pass(q, k, v, scale, axis, n, backend)
    return o, (q, k, v, o, lse)


def _ring_bwd_rule(scale, axis, n, backend, res, g):
    """Ring backward: rotate KV again; per block recompute the true softmax
    slice from the saved GLOBAL lse (FlashAttention-2 scheme), accumulate
    dq locally and rotate dk/dv home with their shards."""
    q, k, v, o, lse = res
    perm = [(i, (i + 1) % n) for i in range(n)]
    qf = q.astype(jnp.float32)
    do = g.astype(jnp.float32)
    # delta_i = sum_d do_i * o_i  (the rowwise dot in ds = p*(dp - delta))
    delta = jnp.einsum("bqhd,bqhd->bhq", do, o.astype(jnp.float32))

    def step(carry, _):
        k_cur, v_cur, dk_acc, dv_acc, dq_acc = carry
        kf = k_cur.astype(jnp.float32)
        vf = v_cur.astype(jnp.float32)
        s = jnp.einsum("bqhd,bkhd->bhqk", qf, kf) * scale
        p = jnp.exp(s - lse[..., None])  # true softmax slice
        dv_blk = jnp.einsum("bhqk,bqhd->bkhd", p, do)
        dp = jnp.einsum("bqhd,bkhd->bhqk", do, vf)
        ds = p * (dp - delta[..., None]) * scale
        dq_new = dq_acc + jnp.einsum("bhqk,bkhd->bqhd", ds, kf)
        dk_blk = jnp.einsum("bhqk,bqhd->bkhd", ds, qf)
        # Rotate the shard AND its gradient accumulators together so each
        # lands back home after the full ring.
        k_nxt = jax.lax.ppermute(k_cur, axis, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis, perm)
        dk_nxt = jax.lax.ppermute(dk_acc + dk_blk, axis, perm)
        dv_nxt = jax.lax.ppermute(dv_acc + dv_blk, axis, perm)
        return (k_nxt, v_nxt, dk_nxt, dv_nxt, dq_new), None

    dk0 = _pcast(jnp.zeros(k.shape, jnp.float32), axis)
    dv0 = _pcast(jnp.zeros(v.shape, jnp.float32), axis)
    dq0 = _pcast(jnp.zeros(q.shape, jnp.float32), axis)
    (k_f, v_f, dk_f, dv_f, dq_f), _ = jax.lax.scan(
        step, (k, v, dk0, dv0, dq0), None, length=n
    )
    return dq_f.astype(q.dtype), dk_f.astype(k.dtype), dv_f.astype(v.dtype)


_ring_shard.defvjp(_ring_fwd_rule, _ring_bwd_rule)


def ring_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    scale: Optional[float] = None,
    axis: str = VIEW_AXIS,
    backend: Optional[str] = None,
) -> jnp.ndarray:
    """Ring attention: KV shards rotate via ppermute; each step runs the
    Pallas flash kernel on the local (Tq/n, Tk/n) block and partials merge
    exactly through their log-sum-exp.

    O(T/n) memory per chip; ICI transfers overlap with per-step kernels.
    Differentiable (ring-level custom VJP).

    Args:
        backend: per-step kernel: "pallas" (TPU), "einsum" (portable),
            "pallas_interpret" (kernel correctness on CPU). Default: pallas
            on TPU, einsum elsewhere.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    n = mesh.shape[axis]
    if backend is None:
        backend = "pallas" if _use_pallas() else "einsum"

    fscale = float(scale)

    def body(q_local, k_local, v_local):
        return _ring_shard(q_local, k_local, v_local, fscale, axis, n, backend)

    spec = P(None, axis, None, None)
    return shard_map(
        body, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,  # pallas_call emits no vma metadata
    )(q, k, v)


# ---------------------------------------------------------------------------
# Context-parallel global attention with extra (replicated) tokens
# ---------------------------------------------------------------------------


def _merge_lse(parts):
    """Exactly merge [(o fp32, lse), ...] partial attentions over disjoint
    KV sets via their log-sum-exp. Returns (o fp32, lse)."""
    o_acc, lse_acc = parts[0]
    for o_blk, lse_blk in parts[1:]:
        lse_new = jnp.logaddexp(lse_acc, lse_blk)
        o_acc = o_acc * _bhq_to_bqh1(jnp.exp(lse_acc - lse_new)) + o_blk * (
            _bhq_to_bqh1(jnp.exp(lse_blk - lse_new))
        )
        lse_acc = lse_new
    return o_acc, lse_acc


def global_attention_cp(
    qg: jnp.ndarray,
    kg: jnp.ndarray,
    vg: jnp.ndarray,
    qe: Optional[jnp.ndarray],
    ke: Optional[jnp.ndarray],
    ve: Optional[jnp.ndarray],
    mesh: Mesh,
    scale: Optional[float] = None,
    axis: str = VIEW_AXIS,
    schedule: str = "allgather",
    backend: Optional[str] = None,
):
    """Global attention for the trunk's even layers under view sharding,
    WITH the reference's additional-token set (the scale token,
    alternating_attention_transformer.py:265-277): grid tokens (B, V*P, H, D)
    are sharded over ``axis``; extra tokens (B, E, H, D) are replicated.
    Every query attends the union KV set exactly (log-sum-exp merges).

    schedule:
      - "allgather": gather grid KV + concat extras; one flash call per
        shard. Differentiable (plain collectives + sdpa).
      - "ring": rotate grid KV around the ring, per-step Pallas flash with
        lse merging; O(T/n) memory. Forward-only (the >200-view inference
        path; training uses "allgather").
    """
    if scale is None:
        scale = qg.shape[-1] ** -0.5
    fscale = float(scale)
    n = mesh.shape[axis]
    if backend is None:
        backend = "pallas" if _use_pallas() else "einsum"
    has_extra = qe is not None

    gspec = P(None, axis, None, None)
    espec = P(None, None, None, None)

    if schedule == "allgather":
        impl = "pallas" if backend.startswith("pallas") else "xla"

        def body(qg_l, kg_l, vg_l, *extra):
            k_full = jax.lax.all_gather(kg_l, axis, axis=1, tiled=True)
            v_full = jax.lax.all_gather(vg_l, axis, axis=1, tiled=True)
            if has_extra:
                qe_l, ke_l, ve_l = extra
                k_full = jnp.concatenate([k_full, ke_l.astype(k_full.dtype)], 1)
                v_full = jnp.concatenate([v_full, ve_l.astype(v_full.dtype)], 1)
                og = sdpa(qg_l, k_full, v_full, scale=fscale, implementation=impl)
                # E extra queries: tiny, computed redundantly on every shard.
                oe = sdpa(qe_l, k_full, v_full, scale=fscale, implementation="xla")
                return og, oe
            return sdpa(qg_l, k_full, v_full, scale=fscale, implementation=impl)

        if has_extra:
            return shard_map(
                body, mesh=mesh,
                in_specs=(gspec, gspec, gspec, espec, espec, espec),
                out_specs=(gspec, espec), check_vma=False,
            )(qg, kg, vg, qe, ke, ve)
        return shard_map(
            body, mesh=mesh, in_specs=(gspec, gspec, gspec),
            out_specs=gspec, check_vma=False,
        )(qg, kg, vg), None

    if schedule != "ring":
        raise ValueError(f"unknown schedule: {schedule}")

    def body(qg_l, kg_l, vg_l, *extra):
        og, lse_g = _ring_fwd_pass(qg_l, kg_l, vg_l, fscale, axis, n, backend)
        og = og.astype(jnp.float32)
        if not has_extra:
            return og.astype(qg_l.dtype)
        qe_l, ke_l, ve_l = extra
        # Grid queries also attend the extra KV (one tiny block).
        o_ge, lse_ge = _block_attn_lse(qg_l, ke_l, ve_l, fscale, backend)
        og, _ = _merge_lse([(og, lse_g), (o_ge, lse_ge)])
        # Extra queries attend every grid shard (merge across the ring) +
        # the extra block itself.
        o_eg, lse_eg = _block_attn_lse(qe_l, kg_l, vg_l, fscale, backend)
        o_all = jax.lax.all_gather(o_eg, axis)       # (n, B, E, H, D)
        lse_all = jax.lax.all_gather(lse_eg, axis)   # (n, B, H, E)
        parts = [(o_all[i], lse_all[i]) for i in range(n)]
        parts.append(_block_attn_lse(qe_l, ke_l, ve_l, fscale, backend))
        oe, _ = _merge_lse(parts)
        return og.astype(qg_l.dtype), oe.astype(qe_l.dtype)

    if has_extra:
        return shard_map(
            body, mesh=mesh,
            in_specs=(gspec, gspec, gspec, espec, espec, espec),
            out_specs=(gspec, espec), check_vma=False,
        )(qg, kg, vg, qe, ke, ve)
    return shard_map(
        body, mesh=mesh, in_specs=(gspec, gspec, gspec),
        out_specs=gspec, check_vma=False,
    )(qg, kg, vg), None
