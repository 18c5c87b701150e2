"""Transformer primitives: attention, MLP, LayerScale, DropPath, blocks.

Capability parity with the reference UniCeption primitives
(``uniception/models/utils/transformer_blocks.py:50-994``): self/cross
attention blocks with optional qk-norm, LayerScale, DropPath,
scalable-softmax and entropy scaling for length extrapolation, and an
optional custom positional encoding (RoPE) hook applied to q/k.

TPU-first design notes:
  - compute dtype is a module attribute (bf16 end-to-end under jit; params
    stay fp32) — no autocast machinery;
  - attention routes through ``mapanything_tpu.ops.attention.sdpa`` which
    dispatches to the Pallas flash kernel on TPU;
  - no data-dependent control flow — dropout/droppath are rate-0 static
    no-ops when disabled.
"""

from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from mapanything_tpu.ops.attention import (
    apply_entropy_scaling,
    apply_scalable_softmax,
    sdpa,
)

Dtype = jnp.dtype
default_kernel_init = nn.initializers.xavier_uniform()


def exact_gelu(x):
    """Erf-based GELU, matching torch ``nn.GELU()``'s default (the reference
    uses it everywhere); flax's ``nn.gelu`` defaults to the tanh approximation
    which differs by up to ~3e-3 per activation."""
    return nn.gelu(x, approximate=False)


def gelu_matched(x):
    """Dtype-aware GELU: exact erf in fp32 (weight-conversion parity —
    validated against the reference in tests/test_reference_parity.py),
    tanh approximation in bf16/fp16 where the erf-tanh gap (max ~3e-3
    absolute, ~0.15% relative at |x|~2) sits below half-precision
    round-off (~0.4% relative) while erf's non-native VPU lowering costs
    ~8% whole-model throughput on TPU (measured: 41.1 vs 37.9 views/s at
    8-view 518 px)."""
    exact = jnp.dtype(x.dtype) == jnp.float32
    return nn.gelu(x, approximate=not exact)


class Mlp(nn.Module):
    """Two-layer MLP with GELU (reference transformer_blocks.py Mlp)."""

    hidden_features: int
    out_features: int
    # Dtype-matched GELU: erf in fp32 (reference parity), tanh in bf16
    # (see gelu_matched).
    act: Callable = gelu_matched
    drop: float = 0.0
    # Extra checkpoint tags ("mlp_in"/"mlp_pre") emitted for the active
    # remat policy (extra_tags_for_policy). The `name` primitives act as
    # scheduling barriers in XLA and can MATERIALIZE the tagged tensor even
    # when the policy discards it (measured: unconditional tags push the
    # 4v 518 px save_attn_mlp train step from fitting to 19.1 GB OOM), so
    # each tag exists only when the active policy saves/offloads it.
    extra_tags: tuple = ()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        from jax.ad_checkpoint import checkpoint_name

        if "mlp_in" in self.extra_tags:
            # "mlp_in": fc1's input — saving it lets the backward compute
            # fc1's weight grad without replaying the preceding LayerNorm
            # chain (policy "save_qkv_attn_mlp", resolve_remat_policy).
            x = checkpoint_name(x, "mlp_in")
        x = nn.Dense(
            self.hidden_features,
            dtype=self.dtype,
            kernel_init=default_kernel_init,
            name="fc1",
        )(x)
        if "mlp_pre" in self.extra_tags:
            # "mlp_pre": the PRE-activation — the GELU backward needs it;
            # saving it (instead of only the post-act "mlp_hidden") removes
            # the fc1 matmul from the rematerialization replay entirely.
            x = checkpoint_name(x, "mlp_pre")
        x = self.act(x)
        x = checkpoint_name(x, "mlp_hidden")
        if self.drop > 0.0:
            x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        x = nn.Dense(
            self.out_features,
            dtype=self.dtype,
            kernel_init=default_kernel_init,
            name="fc2",
        )(x)
        if self.drop > 0.0:
            x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        return x


class LayerScale(nn.Module):
    """Per-channel learnable residual scaling (reference :50)."""

    dim: int
    init_values: float = 1e-5

    @nn.compact
    def __call__(self, x):
        gamma = self.param(
            "gamma", nn.initializers.constant(self.init_values), (self.dim,)
        )
        return x * gamma.astype(x.dtype)


class DropPath(nn.Module):
    """Stochastic depth per sample (identity at rate 0 / eval)."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("droppath")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jnp.floor(keep + jnp.asarray(
            nn.initializers.uniform(1.0)(rng, shape), x.dtype
        ))
        return x / keep * mask


class Attention(nn.Module):
    """Multi-head self-attention (reference transformer_blocks.py:91).

    Supports qk-norm, scalable-softmax / entropy scaling (query-side
    multipliers, :186-197) and an optional rope callable applied to q and k
    given token positions.
    """

    dim: int
    num_heads: int = 8
    qkv_bias: bool = False
    qk_norm: bool = False
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    rope: Optional[Callable] = None
    use_scalable_softmax: bool = False
    use_entropy_scaling: bool = False
    base_token_count_for_entropy_scaling: int = 444
    entropy_scaling_growth_factor: float = 1.4
    # Context-parallel routing (trunk global layers): when cp_global is set
    # and a parallel.cp context is active, the LAST cp_extra_tokens tokens
    # are the replicated additional-token set (scale token) and the rest are
    # view-sharded grid tokens — attention runs through the explicit
    # allgather/ring schedules of parallel/sharded_attention.py.
    cp_global: bool = False
    cp_extra_tokens: int = 0
    # Extra checkpoint tags ("qkv_out") for the active remat policy
    # (see Mlp.extra_tags for why each must be conditional).
    extra_tags: tuple = ()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, xpos=None, deterministic: bool = True):
        B, N, C = x.shape
        head_dim = self.dim // self.num_heads
        qkv = nn.Dense(
            self.dim * 3,
            use_bias=self.qkv_bias,
            dtype=self.dtype,
            kernel_init=default_kernel_init,
            name="qkv",
        )(x)
        from jax.ad_checkpoint import checkpoint_name

        if "qkv_out" in self.extra_tags:
            # "qkv_out": saving the packed qkv projection removes the qkv
            # matmul from the backward replay; rope/qk-norm recompute from
            # it is pure VPU work (policy "save_qkv_attn_mlp").
            qkv = checkpoint_name(qkv, "qkv_out")
        qkv = qkv.reshape(B, N, 3, self.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (B, N, H, D)

        if self.qk_norm:
            q = nn.LayerNorm(dtype=self.dtype, name="q_norm")(q)
            k = nn.LayerNorm(dtype=self.dtype, name="k_norm")(k)

        if self.rope is not None:
            assert xpos is not None, "xpos required when using rope"
            q = self.rope(q, xpos)
            k = self.rope(k, xpos)

        if self.use_scalable_softmax:
            q = apply_scalable_softmax(q, N)
        if self.use_entropy_scaling:
            q = apply_entropy_scaling(
                q,
                N,
                self.base_token_count_for_entropy_scaling,
                self.entropy_scaling_growth_factor,
            )

        # Named checkpoint tag: under remat_policy="save_attn[_mlp]" the
        # attention output is SAVED and everything else recomputed in the
        # backward replay (VERDICT r1 item 3: save attention outputs,
        # recompute MLPs).
        cp = None
        if self.cp_global:
            from mapanything_tpu.parallel.cp import current_cp

            cp = current_cp()
        if cp is not None:
            from mapanything_tpu.parallel.sharded_attention import (
                global_attention_cp,
            )

            E = self.cp_extra_tokens
            g = N - E
            og, oe = global_attention_cp(
                q[:, :g], k[:, :g], v[:, :g],
                q[:, g:] if E else None,
                k[:, g:] if E else None,
                v[:, g:] if E else None,
                mesh=cp.mesh, scale=head_dim**-0.5, axis=cp.axis,
                schedule=cp.schedule, backend=cp.backend,
            )
            out = jnp.concatenate([og, oe.astype(og.dtype)], 1) if E else og
        else:
            out = sdpa(q, k, v, scale=head_dim**-0.5)
        out = checkpoint_name(out, "attn_out")
        out = out.reshape(B, N, self.dim)
        out = nn.Dense(
            self.dim, dtype=self.dtype, kernel_init=default_kernel_init, name="proj"
        )(out)
        if self.proj_drop > 0.0:
            out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
        return out


class CrossAttention(nn.Module):
    """Multi-head cross-attention (reference transformer_blocks.py:216)."""

    dim: int
    num_heads: int = 8
    qkv_bias: bool = False
    qk_norm: bool = False
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    rope: Optional[Callable] = None
    use_scalable_softmax: bool = False
    use_entropy_scaling: bool = False
    base_token_count_for_entropy_scaling: int = 444
    entropy_scaling_growth_factor: float = 1.4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, query, key, value, qpos=None, kpos=None, deterministic=True):
        B, Nq, C = query.shape
        Nk = key.shape[1]
        head_dim = self.dim // self.num_heads

        q = nn.Dense(
            self.dim, use_bias=self.qkv_bias, dtype=self.dtype,
            kernel_init=default_kernel_init, name="projq",
        )(query).reshape(B, Nq, self.num_heads, head_dim)
        k = nn.Dense(
            self.dim, use_bias=self.qkv_bias, dtype=self.dtype,
            kernel_init=default_kernel_init, name="projk",
        )(key).reshape(B, Nk, self.num_heads, head_dim)
        v = nn.Dense(
            self.dim, use_bias=self.qkv_bias, dtype=self.dtype,
            kernel_init=default_kernel_init, name="projv",
        )(value).reshape(B, Nk, self.num_heads, head_dim)

        if self.qk_norm:
            q = nn.LayerNorm(dtype=self.dtype, name="q_norm")(q)
            k = nn.LayerNorm(dtype=self.dtype, name="k_norm")(k)

        if self.rope is not None:
            if qpos is not None:
                q = self.rope(q, qpos)
            if kpos is not None:
                k = self.rope(k, kpos)

        if self.use_scalable_softmax:
            q = apply_scalable_softmax(q, Nk)
        if self.use_entropy_scaling:
            q = apply_entropy_scaling(
                q,
                Nk,
                self.base_token_count_for_entropy_scaling,
                self.entropy_scaling_growth_factor,
            )

        out = sdpa(q, k, v, scale=head_dim**-0.5)
        out = out.reshape(B, Nq, self.dim)
        out = nn.Dense(
            self.dim, dtype=self.dtype, kernel_init=default_kernel_init, name="proj"
        )(out)
        if self.proj_drop > 0.0:
            out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
        return out


class SelfAttentionBlock(nn.Module):
    """Pre-norm self-attention transformer block (reference :370).

    With ``differential=True`` the attention is :class:`DiffAttention`
    (reference DiffSelfAttentionBlock, transformer_blocks.py:903);
    ``layer_depth`` seeds the lambda schedule.
    """

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_norm: bool = False
    proj_drop: float = 0.0
    attn_drop: float = 0.0
    init_values: Optional[float] = None
    drop_path: float = 0.0
    rope: Optional[Callable] = None
    use_scalable_softmax: bool = False
    use_entropy_scaling: bool = False
    base_token_count_for_entropy_scaling: int = 444
    entropy_scaling_growth_factor: float = 1.4
    differential: bool = False
    layer_depth: int = 0
    cp_global: bool = False
    cp_extra_tokens: int = 0
    extra_tags: tuple = ()  # per-policy checkpoint tags (see Mlp)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, xpos=None, deterministic: bool = True):
        ls1 = (
            LayerScale(self.dim, self.init_values, name="ls1")
            if self.init_values is not None
            else (lambda y: y)
        )
        ls2 = (
            LayerScale(self.dim, self.init_values, name="ls2")
            if self.init_values is not None
            else (lambda y: y)
        )
        dp = DropPath(self.drop_path)

        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        if self.differential:
            y = DiffAttention(
                dim=self.dim,
                depth=self.layer_depth,
                num_heads=self.num_heads,
                qkv_bias=self.qkv_bias,
                rope=self.rope,
                dtype=self.dtype,
                name="attn",
            )(y, xpos, deterministic)
        else:
            y = Attention(
                dim=self.dim,
                num_heads=self.num_heads,
                qkv_bias=self.qkv_bias,
                qk_norm=self.qk_norm,
                attn_drop=self.attn_drop,
                proj_drop=self.proj_drop,
                rope=self.rope,
                use_scalable_softmax=self.use_scalable_softmax,
                use_entropy_scaling=self.use_entropy_scaling,
                base_token_count_for_entropy_scaling=self.base_token_count_for_entropy_scaling,
                entropy_scaling_growth_factor=self.entropy_scaling_growth_factor,
                cp_global=self.cp_global,
                cp_extra_tokens=self.cp_extra_tokens,
                extra_tags=self.extra_tags,
                dtype=self.dtype,
                name="attn",
            )(y, xpos, deterministic)
        x = x + dp(ls1(y), deterministic)

        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        y = Mlp(
            hidden_features=int(self.dim * self.mlp_ratio),
            out_features=self.dim,
            drop=self.proj_drop,
            extra_tags=self.extra_tags,
            dtype=self.dtype,
            name="mlp",
        )(y, deterministic)
        return x + dp(ls2(y), deterministic)


class CrossAttentionBlock(nn.Module):
    """Self-attn + cross-attn + MLP decoder block (reference :472).

    With ``differential=True`` the cross-attention is
    :class:`DiffCrossAttention` while the self-attention stays standard
    (reference DiffCrossAttentionBlock, transformer_blocks.py:952).
    """

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_norm: bool = False
    proj_drop: float = 0.0
    attn_drop: float = 0.0
    init_values: Optional[float] = None
    drop_path: float = 0.0
    norm_mem: bool = True
    rope: Optional[Callable] = None
    use_scalable_softmax: bool = False
    use_entropy_scaling: bool = False
    differential: bool = False
    layer_depth: int = 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context, xpos=None, cpos=None, deterministic=True):
        def make_ls(name):
            return (
                LayerScale(self.dim, self.init_values, name=name)
                if self.init_values is not None
                else (lambda y: y)
            )

        dp = DropPath(self.drop_path)

        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        y = Attention(
            dim=self.dim,
            num_heads=self.num_heads,
            qkv_bias=self.qkv_bias,
            qk_norm=self.qk_norm,
            rope=self.rope,
            use_scalable_softmax=self.use_scalable_softmax,
            use_entropy_scaling=self.use_entropy_scaling,
            dtype=self.dtype,
            name="attn",
        )(y, xpos, deterministic)
        x = x + dp(make_ls("ls1")(y), deterministic)

        mem = (
            nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm_mem")(context)
            if self.norm_mem
            else context
        )
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        if self.differential:
            y = DiffCrossAttention(
                dim=self.dim,
                depth=self.layer_depth,
                num_heads=self.num_heads,
                qkv_bias=self.qkv_bias,
                qk_norm=self.qk_norm,
                rope=self.rope,
                dtype=self.dtype,
                name="cross_attn",
            )(y, mem, mem, xpos, cpos, deterministic)
        else:
            y = CrossAttention(
                dim=self.dim,
                num_heads=self.num_heads,
                qkv_bias=self.qkv_bias,
                qk_norm=self.qk_norm,
                rope=self.rope,
                use_scalable_softmax=self.use_scalable_softmax,
                use_entropy_scaling=self.use_entropy_scaling,
                dtype=self.dtype,
                name="cross_attn",
            )(y, mem, mem, xpos, cpos, deterministic)
        x = x + dp(make_ls("ls2")(y), deterministic)

        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm3")(x)
        y = Mlp(
            hidden_features=int(self.dim * self.mlp_ratio),
            out_features=self.dim,
            dtype=self.dtype,
            name="mlp",
        )(y, deterministic)
        return x + dp(make_ls("ls3")(y), deterministic)


def _lambda_init_fn(depth: int) -> float:
    """DiffTransformer lambda schedule (reference transformer_blocks.py)."""
    import math

    return 0.8 - 0.6 * math.exp(-0.3 * depth)


class RMSNorm(nn.Module):
    """Root-mean-square LayerNorm (reference transformer_blocks.py RMSNorm)."""

    dim: int
    eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.dim,))
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
        y = x * jax.lax.rsqrt(var + self.eps).astype(x.dtype)
        return y * scale.astype(x.dtype)


class DiffAttention(nn.Module):
    """Differential self-attention (arXiv:2410.05258; reference :641).

    Heads are split into two groups whose attention maps are subtracted
    with a learned lambda, suppressing attention noise; the per-head output
    is RMS-normalized and rescaled by (1 - lambda_init).
    """

    dim: int
    depth: int
    num_heads: int = 8
    qkv_bias: bool = False
    rope: Optional[Callable] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, xpos=None, deterministic: bool = True):
        B, N, C = x.shape
        head_dim = self.dim // self.num_heads // 2
        lambda_init = _lambda_init_fn(self.depth)

        qkv = nn.Dense(
            self.dim * 3, use_bias=self.qkv_bias, dtype=self.dtype,
            kernel_init=default_kernel_init, name="qkv",
        )(x).reshape(B, N, 3, self.num_heads, head_dim * 2)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]

        q = q.reshape(B, N, 2 * self.num_heads, head_dim)
        k = k.reshape(B, N, 2 * self.num_heads, head_dim)
        v = v.reshape(B, N, self.num_heads, 2 * head_dim)

        if self.rope is not None:
            q = self.rope(q, xpos)
            k = self.rope(k, xpos)

        q1, q2 = q[:, :, : self.num_heads], q[:, :, self.num_heads :]
        k1, k2 = k[:, :, : self.num_heads], k[:, :, self.num_heads :]

        # v's head dim (2*Dh) differs from q/k's (Dh), so fused SDPA does
        # not apply; explicit softmax attention (ablation-only path).
        scale = head_dim**-0.5

        def attend(qh, kh):
            logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) * scale
            w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(v.dtype)
            return jnp.einsum("bhqk,bkhd->bqhd", w, v)

        attn1 = attend(q1, k1)
        attn2 = attend(q2, k2)

        lam_q1 = self.param("lambda_q1", nn.initializers.normal(0.1), (head_dim,))
        lam_k1 = self.param("lambda_k1", nn.initializers.normal(0.1), (head_dim,))
        lam_q2 = self.param("lambda_q2", nn.initializers.normal(0.1), (head_dim,))
        lam_k2 = self.param("lambda_k2", nn.initializers.normal(0.1), (head_dim,))
        lam_1 = jnp.exp(jnp.sum(lam_q1 * lam_k1))
        lam_2 = jnp.exp(jnp.sum(lam_q2 * lam_k2))
        lam = (lam_1 - lam_2 + lambda_init).astype(attn1.dtype)

        attn = attn1 - lam * attn2  # (B, N, H, 2*Dh)
        attn = RMSNorm(2 * head_dim, dtype=self.dtype, name="subln")(attn)
        attn = attn * (1 - lambda_init)
        attn = attn.reshape(B, N, self.num_heads * 2 * head_dim)

        out = nn.Dense(
            self.dim, dtype=self.dtype, kernel_init=default_kernel_init, name="proj"
        )(attn)
        return out


class DiffCrossAttention(nn.Module):
    """Differential cross-attention (reference transformer_blocks.py:762).

    Same noise-cancelling two-group mechanism as :class:`DiffAttention`,
    with separate q/k/v projections so queries and context differ.
    """

    dim: int
    depth: int
    num_heads: int = 8
    qkv_bias: bool = False
    qk_norm: bool = False
    rope: Optional[Callable] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, query, key, value, qpos=None, kpos=None, deterministic=True):
        B, Nq, C = query.shape
        Nk = key.shape[1]
        head_dim = self.dim // self.num_heads // 2
        lambda_init = _lambda_init_fn(self.depth)

        def proj(inp, n_tok, n_heads, d, name):
            return nn.Dense(
                self.dim, use_bias=self.qkv_bias, dtype=self.dtype,
                kernel_init=default_kernel_init, name=name,
            )(inp).reshape(B, n_tok, n_heads, d)

        q = proj(query, Nq, 2 * self.num_heads, head_dim, "projq")
        k = proj(key, Nk, 2 * self.num_heads, head_dim, "projk")
        v = proj(value, Nk, self.num_heads, 2 * head_dim, "projv")

        if self.qk_norm:
            q = nn.LayerNorm(dtype=self.dtype, name="q_norm")(q)
            k = nn.LayerNorm(dtype=self.dtype, name="k_norm")(k)

        if self.rope is not None:
            if qpos is not None:
                q = self.rope(q, qpos)
            if kpos is not None:
                k = self.rope(k, kpos)

        q1, q2 = q[:, :, : self.num_heads], q[:, :, self.num_heads :]
        k1, k2 = k[:, :, : self.num_heads], k[:, :, self.num_heads :]

        scale = head_dim**-0.5

        def attend(qh, kh):
            logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) * scale
            w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(v.dtype)
            return jnp.einsum("bhqk,bkhd->bqhd", w, v)

        attn1 = attend(q1, k1)
        attn2 = attend(q2, k2)

        lam_q1 = self.param("lambda_q1", nn.initializers.normal(0.1), (head_dim,))
        lam_k1 = self.param("lambda_k1", nn.initializers.normal(0.1), (head_dim,))
        lam_q2 = self.param("lambda_q2", nn.initializers.normal(0.1), (head_dim,))
        lam_k2 = self.param("lambda_k2", nn.initializers.normal(0.1), (head_dim,))
        lam_1 = jnp.exp(jnp.sum(lam_q1 * lam_k1))
        lam_2 = jnp.exp(jnp.sum(lam_q2 * lam_k2))
        lam = (lam_1 - lam_2 + lambda_init).astype(attn1.dtype)

        attn = attn1 - lam * attn2  # (B, Nq, H, 2*Dh)
        attn = RMSNorm(2 * head_dim, dtype=self.dtype, name="subln")(attn)
        attn = attn * (1 - lambda_init)
        attn = attn.reshape(B, Nq, self.num_heads * 2 * head_dim)

        out = nn.Dense(
            self.dim, dtype=self.dtype, kernel_init=default_kernel_init, name="proj"
        )(attn)
        return out


def resolve_remat_policy(name):
    """Map a config string to a jax.checkpoint policy (None = full remat)."""
    if name is None:
        return None
    import jax

    return {
        "dots": jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
        "dots_saveable": jax.checkpoint_policies.dots_saveable,
        # selective: keep the attention outputs (and optionally the MLP
        # hidden activations) across the backward, recompute the rest
        "save_attn": jax.checkpoint_policies.save_only_these_names(
            "attn_out"
        ),
        "save_attn_mlp": jax.checkpoint_policies.save_only_these_names(
            "attn_out", "mlp_hidden"
        ),
        # attn_out + the MLP PRE-activation: same device footprint as
        # save_attn_mlp (5*T*C bf16/layer) but the gelu backward reads the
        # saved pre-act directly, so the fc1 matmul (4*T*C^2, a third of a
        # block's matmul replay) drops out of the rematerialization.
        "save_attn_mlp_pre": jax.checkpoint_policies.save_only_these_names(
            "attn_out", "mlp_pre"
        ),
        # zero-matmul replay: every matmul's input AND output inside a
        # block is saved (qkv projection, attention out, fc1 in/pre-act),
        # so the backward replay is pure VPU work (layernorm/gelu/rope).
        # ~9*T*C bf16 per transformer layer — ~4.2 GB at 4v 518 px
        # flagship; measured 20.8 GB total at that shape, so this variant
        # needs a >24 GB part (v5p/v6e) — see the offload variants below
        # for 16 GB chips.
        "save_qkv_attn_mlp": jax.checkpoint_policies.save_only_these_names(
            "qkv_out", "attn_out", "mlp_in", "mlp_pre"
        ),
        # save_attn_mlp_pre on device + the qkv projection offloaded to
        # pinned host memory: kills the qkv replay too; XLA overlaps the
        # DMA with forward compute.
        "save_attn_mlp_pre_offload_qkv": (
            jax.checkpoint_policies.save_and_offload_only_these_names(
                names_which_can_be_saved=["attn_out", "mlp_pre"],
                names_which_can_be_offloaded=["qkv_out"],
                offload_src="device",
                offload_dst="pinned_host",
            )
        ),
        # zero-matmul replay with the largest tensor streamed to pinned
        # host memory (frees ~2 GB HBM vs the device-save variant).
        "save_qkv_attn_mlp_offload": (
            jax.checkpoint_policies.save_and_offload_only_these_names(
                names_which_can_be_saved=["qkv_out", "attn_out", "mlp_in"],
                names_which_can_be_offloaded=["mlp_pre"],
                offload_src="device",
                offload_dst="pinned_host",
            )
        ),
        "nothing": None,
    }[name]


# Checkpoint tags beyond the always-on "attn_out"/"mlp_hidden" that each
# policy needs emitted (a tag on a tensor no policy saves would act as a
# bare materialization barrier — see Mlp.extra_tags).
_EXTRA_TAG_SETS = {
    "save_attn_mlp_pre": ("mlp_pre",),
    "save_attn_mlp_pre_offload_qkv": ("qkv_out", "mlp_pre"),
    "save_qkv_attn_mlp": ("qkv_out", "mlp_in", "mlp_pre"),
    "save_qkv_attn_mlp_offload": ("qkv_out", "mlp_in", "mlp_pre"),
}


def extra_tags_for_policy(name) -> tuple:
    return _EXTRA_TAG_SETS.get(name, ())
