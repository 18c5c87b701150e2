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
    online merge through log-sum-exp. Returns (o fp32, lse_global)."""
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
    return o_f, lse_f


def _ring_fwd_rule(q, k, v, scale, axis, n, backend):
    o, lse = _ring_fwd_pass(q, k, v, scale, axis, n, backend)
    o = o.astype(q.dtype)
    return o, (q, k, v, o, lse)


def _ring_block_bwd(q, k_blk, v_blk, o, lse, do, delta, scale, backend):
    """One ring step of the FlashAttention-2 backward against the GLOBAL
    lse: (dq_partial, dk_blk, dv_blk), all fp32.

    Pallas backends route through the FA-2 dq / dk+dv kernels
    (ops.flash_attention.flash_attention_bwd_lse) — the per-block score
    matrix exists only in VMEM tiles, keeping the differentiated ring
    O(T/n) in HBM. Tiny token groups fall back to a dense fp32 einsum.
    """
    if q.shape[1] < 128 or k_blk.shape[1] < 128:
        backend = "einsum"
    if backend.startswith("pallas"):
        from mapanything_tpu.ops.flash_attention import flash_attention_bwd_lse

        dq_p, dk_b, dv_b = flash_attention_bwd_lse(
            q, k_blk, v_blk, o, lse, do, scale=scale,
            interpret=backend == "pallas_interpret",
        )
        return (
            dq_p.astype(jnp.float32),
            dk_b.astype(jnp.float32),
            dv_b.astype(jnp.float32),
        )
    qf = q.astype(jnp.float32)
    dof = do.astype(jnp.float32)
    kf = k_blk.astype(jnp.float32)
    vf = v_blk.astype(jnp.float32)
    s = jnp.einsum("bqhd,bkhd->bhqk", qf, kf) * scale
    p = jnp.exp(s - lse[..., None])  # true softmax slice
    dv_b = jnp.einsum("bhqk,bqhd->bkhd", p, dof)
    dp = jnp.einsum("bqhd,bkhd->bhqk", dof, vf)
    ds = p * (dp - delta[..., None]) * scale
    dq_p = jnp.einsum("bhqk,bkhd->bqhd", ds, kf)
    dk_b = jnp.einsum("bhqk,bqhd->bkhd", ds, qf)
    return dq_p, dk_b, dv_b


def _ring_bwd_rule(scale, axis, n, backend, res, g):
    """Ring backward: rotate KV again; per block run the Pallas FA-2
    backward kernels against the saved GLOBAL lse, accumulate dq locally
    and rotate dk/dv home with their shards."""
    q, k, v, o, lse = res
    perm = [(i, (i + 1) % n) for i in range(n)]
    do = g.astype(q.dtype)
    # delta_i = sum_d do_i * o_i  (the rowwise dot in ds = p*(dp - delta))
    delta = jnp.einsum(
        "bqhd,bqhd->bhq", g.astype(jnp.float32), o.astype(jnp.float32)
    )

    def step(carry, _):
        k_cur, v_cur, dk_acc, dv_acc, dq_acc = carry
        dq_blk, dk_blk, dv_blk = _ring_block_bwd(
            q, k_cur, v_cur, o, lse, do, delta, scale, backend
        )
        # Rotate the shard AND its gradient accumulators together so each
        # lands back home after the full ring.
        k_nxt = jax.lax.ppermute(k_cur, axis, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis, perm)
        dk_nxt = jax.lax.ppermute(dk_acc + dk_blk, axis, perm)
        dv_nxt = jax.lax.ppermute(dv_acc + dv_blk, axis, perm)
        return (k_nxt, v_nxt, dk_nxt, dv_nxt, dq_acc + dq_blk), None

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


# --- ring schedule with replicated extra tokens: shard-level custom VJP ---


def _ring_extra_fwd_pass(qg, kg, vg, qe, ke, ve, scale, axis, n, backend):
    """Forward of the ring schedule WITH extra tokens. Grid queries ring
    over grid KV then merge the (tiny) extra-KV block; extra queries merge
    their per-shard grid partials (one all_gather) plus the extra block.
    Returns (og fp32, lse_g, oe fp32, lse_e) — the lse's are GLOBAL
    normalizers (grid + extra KV union)."""
    og, lse_grid = _ring_fwd_pass(qg, kg, vg, scale, axis, n, backend)
    o_ge, lse_ge = _block_attn_lse(qg, ke, ve, scale, backend)
    og, lse_g = _merge_lse([(og, lse_grid), (o_ge, lse_ge)])
    # Extra queries attend every grid shard (merged across the ring) + the
    # extra block itself; E is tiny so each shard computes oe redundantly.
    o_eg, lse_eg = _block_attn_lse(qe, kg, vg, scale, backend)
    o_all = jax.lax.all_gather(o_eg, axis)       # (n, B, E, H, D)
    lse_all = jax.lax.all_gather(lse_eg, axis)   # (n, B, H, E)
    parts = [(o_all[i], lse_all[i]) for i in range(n)]
    parts.append(_block_attn_lse(qe, ke, ve, scale, backend))
    oe, lse_e = _merge_lse(parts)
    return og, lse_g, oe, lse_e


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def _ring_extra_shard(qg, kg, vg, qe, ke, ve, scale, axis, n, backend):
    og, _, oe, _ = _ring_extra_fwd_pass(
        qg, kg, vg, qe, ke, ve, scale, axis, n, backend
    )
    return og.astype(qg.dtype), oe.astype(qe.dtype)


def _ring_extra_fwd_rule(qg, kg, vg, qe, ke, ve, scale, axis, n, backend):
    og, lse_g, oe, lse_e = _ring_extra_fwd_pass(
        qg, kg, vg, qe, ke, ve, scale, axis, n, backend
    )
    og = og.astype(qg.dtype)
    oe = oe.astype(qe.dtype)
    res = (qg, kg, vg, qe, ke, ve, og, lse_g, oe, lse_e)
    return (og, oe), res


def _ring_extra_bwd_rule(scale, axis, n, backend, res, g):
    """Backward of the ring-with-extras schedule. Grid-vs-grid gradients
    ride the same kernel-backed ring as _ring_bwd_rule (against the global
    lse_g, which includes the extra KV). The extra-token interactions are
    tiny dense blocks.

    shard_map transpose semantics (verified empirically, check_vma=False):
    the cotangent of a REPLICATED output arrives DIVIDED BY n on each
    shard, and the cotangents this rule returns for REPLICATED inputs are
    psum'd by shard_map afterwards. So: scale ``doe`` back to the full
    cotangent, and return extras' grads as per-shard contributions —
    shard-specific terms at full strength, shard-identical (extra-vs-
    extra) terms divided by n — so the outer psum lands the exact total.
    """
    qg, kg, vg, qe, ke, ve, og, lse_g, oe, lse_e = res
    dog, doe = g
    perm = [(i, (i + 1) % n) for i in range(n)]
    dogf = dog.astype(jnp.float32)
    doef = doe.astype(jnp.float32) * n  # full cotangent of the replicated oe
    delta_g = jnp.einsum("bqhd,bqhd->bhq", dogf, og.astype(jnp.float32))
    delta_e = jnp.einsum("bqhd,bqhd->bhq", doef, oe.astype(jnp.float32))

    # 1) grid queries vs grid KV: kernel-backed ring (same as _ring_bwd_rule)
    do_cast = dog.astype(qg.dtype)

    def step(carry, _):
        k_cur, v_cur, dk_acc, dv_acc, dq_acc = carry
        dq_blk, dk_blk, dv_blk = _ring_block_bwd(
            qg, k_cur, v_cur, og, lse_g, do_cast, delta_g, scale, backend
        )
        k_nxt = jax.lax.ppermute(k_cur, axis, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis, perm)
        dk_nxt = jax.lax.ppermute(dk_acc + dk_blk, axis, perm)
        dv_nxt = jax.lax.ppermute(dv_acc + dv_blk, axis, perm)
        return (k_nxt, v_nxt, dk_nxt, dv_nxt, dq_acc + dq_blk), None

    dk0 = _pcast(jnp.zeros(kg.shape, jnp.float32), axis)
    dv0 = _pcast(jnp.zeros(vg.shape, jnp.float32), axis)
    dq0 = _pcast(jnp.zeros(qg.shape, jnp.float32), axis)
    (_, _, dkg, dvg, dqg), _ = jax.lax.scan(
        step, (kg, vg, dk0, dv0, dq0), None, length=n
    )

    qgf = qg.astype(jnp.float32)
    kef = ke.astype(jnp.float32)
    vef = ve.astype(jnp.float32)
    qef = qe.astype(jnp.float32)
    kgf = kg.astype(jnp.float32)
    vgf = vg.astype(jnp.float32)

    # 2) grid queries vs extra KV (dense tiny block, (Tq/n, E)); this
    # shard's contribution to the replicated extras — psum'd by shard_map.
    s_ge = jnp.einsum("bqhd,bkhd->bhqk", qgf, kef) * scale
    p_ge = jnp.exp(s_ge - lse_g[..., None])
    dve = jnp.einsum("bhqk,bqhd->bkhd", p_ge, dogf)
    dp_ge = jnp.einsum("bqhd,bkhd->bhqk", dogf, vef)
    ds_ge = p_ge * (dp_ge - delta_g[..., None]) * scale
    dke = jnp.einsum("bhqk,bqhd->bkhd", ds_ge, qgf)
    dqg = dqg + jnp.einsum("bhqk,bkhd->bqhd", ds_ge, kef)

    # 3) extra queries vs the LOCAL grid shard ((E, Tk/n) dense block)
    s_eg = jnp.einsum("bqhd,bkhd->bhqk", qef, kgf) * scale
    p_eg = jnp.exp(s_eg - lse_e[..., None])
    dvg = dvg + jnp.einsum("bhqk,bqhd->bkhd", p_eg, doef)
    dp_eg = jnp.einsum("bqhd,bkhd->bhqk", doef, vgf)
    ds_eg = p_eg * (dp_eg - delta_e[..., None]) * scale
    dkg = dkg + jnp.einsum("bhqk,bqhd->bkhd", ds_eg, qef)
    dqe = jnp.einsum("bhqk,bkhd->bqhd", ds_eg, kgf)

    # 4) extra queries vs extra KV: identical on every shard, so divide by
    # n — the outer psum then restores the single true contribution.
    s_ee = jnp.einsum("bqhd,bkhd->bhqk", qef, kef) * scale
    p_ee = jnp.exp(s_ee - lse_e[..., None])
    inv_n = 1.0 / n
    dve = dve + jnp.einsum("bhqk,bqhd->bkhd", p_ee, doef) * inv_n
    dp_ee = jnp.einsum("bqhd,bkhd->bhqk", doef, vef)
    ds_ee = p_ee * (dp_ee - delta_e[..., None]) * scale
    dke = dke + jnp.einsum("bhqk,bqhd->bkhd", ds_ee, qef) * inv_n
    dqe = dqe + jnp.einsum("bhqk,bkhd->bqhd", ds_ee, kef) * inv_n

    return (
        dqg.astype(qg.dtype),
        dkg.astype(kg.dtype),
        dvg.astype(vg.dtype),
        dqe.astype(qe.dtype),
        dke.astype(ke.dtype),
        dve.astype(ve.dtype),
    )


_ring_extra_shard.defvjp(_ring_extra_fwd_rule, _ring_extra_bwd_rule)


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
        shard. Differentiable (plain collectives + sdpa); O(T) KV per chip.
      - "ring": rotate grid KV around the ring, per-step Pallas flash with
        lse merging; O(T/n) memory. Differentiable: the backward rotates
        KV again and runs the Pallas FA-2 dq / dk+dv kernels per block
        against the saved global lse (_ring_extra_bwd_rule) — the
        >200-view training/finetune path.
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
        if not has_extra:
            return _ring_shard(qg_l, kg_l, vg_l, fscale, axis, n, backend)
        qe_l, ke_l, ve_l = extra
        return _ring_extra_shard(
            qg_l, kg_l, vg_l, qe_l, ke_l, ve_l, fscale, axis, n, backend
        )

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
