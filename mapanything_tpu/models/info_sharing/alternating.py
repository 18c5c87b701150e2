"""Multi-view alternating-attention transformer (the production trunk).

Capability parity with
``uniception/models/info_sharing/alternating_attention_transformer.py:22,411``:
even layers attend globally over all views' tokens (+ additional tokens,
e.g. the scale token), odd layers attend within each frame (additional
tokens bypass frame layers). Reference-view positional encoding on view 0
distinguishes the frame that anchors the world coordinate system; optional
(random-index) PE for non-reference views.

TPU-first design:
  - operates on a stacked (B, V, h, w, C) array — no Python lists of views;
  - the frame-attention reshape (B, V*P, C) <-> (B*V, P, C) is a free
    relayout under XLA;
  - global attention over V*P+T tokens routes to the Pallas flash kernel;
    when a mesh with a "view" axis is active, the caller shards V and the
    global layers run as all-gather-KV attention (see
    ``mapanything_tpu.parallel.context``);
  - intermediate-feature taps (``indices``) are static so everything jits.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from mapanything_tpu.models.blocks import SelfAttentionBlock
from mapanything_tpu.models.encoders.dense_rep import sinusoid_encoding_table


class _AlternatingPairBody(nn.Module):
    """One (global, frame) layer pair — the repeating unit of the trunk.

    Used as the ``nn.scan`` body when ``scan_pairs`` is set: scanning the
    12 identical pairs keeps ONE pair's HLO in the program instead of 24
    unrolled distinct blocks, shrinking compile time ~an order of magnitude
    on hosts where XLA compilation is the bottleneck (the driver's virtual
    CPU mesh dryrun). Numerics are identical to the unrolled loop — the
    equality test rides in tests/test_scan_layers.py, and
    ``models.scan_repack`` converts parameter trees between the two
    layouts.
    """

    dim: int
    num_heads: int
    mlp_ratio: float
    qkv_bias: bool
    qk_norm: bool
    init_values: Optional[float]
    use_scalable_softmax: bool
    use_entropy_scaling: bool
    base_token_count_for_entropy_scaling: int
    entropy_scaling_growth_factor: float
    context_parallel: bool
    num_views: int
    tokens_per_view: int
    extra_tokens: int
    deterministic: bool
    remat: bool
    remat_policy: Optional[str]
    extra_tags: tuple
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x, _):
        from mapanything_tpu.models.blocks import resolve_remat_policy

        B = x.shape[0]
        V, P, T = self.num_views, self.tokens_per_view, self.extra_tokens
        block_cls = SelfAttentionBlock
        if self.remat:
            block_cls = nn.remat(
                SelfAttentionBlock, static_argnums=(2,),
                policy=resolve_remat_policy(self.remat_policy),
            )
        common = dict(
            dim=self.dim,
            num_heads=self.num_heads,
            mlp_ratio=self.mlp_ratio,
            qkv_bias=self.qkv_bias,
            qk_norm=self.qk_norm,
            init_values=self.init_values,
            use_scalable_softmax=self.use_scalable_softmax,
            use_entropy_scaling=self.use_entropy_scaling,
            base_token_count_for_entropy_scaling=self.base_token_count_for_entropy_scaling,
            entropy_scaling_growth_factor=self.entropy_scaling_growth_factor,
            extra_tags=self.extra_tags,
            dtype=self.dtype,
        )
        # Global attention over all views (+ additional tokens).
        x = block_cls(
            **common,
            cp_global=self.context_parallel,
            cp_extra_tokens=T,
            name="gblock",
        )(x, None, self.deterministic)
        x_global = x
        # Frame-level attention; additional tokens bypass this layer.
        view_tok = x[:, : V * P, :].reshape(B * V, P, self.dim)
        view_tok = block_cls(**common, name="fblock")(
            view_tok, None, self.deterministic
        )
        view_tok = view_tok.reshape(B, V * P, self.dim)
        if T:
            x = jnp.concatenate([view_tok, x[:, V * P :, :]], axis=1)
        else:
            x = view_tok
        # Emit both per-layer outputs so intermediate taps at ANY depth
        # index (even or odd) can be selected outside the scan.
        return x, jnp.stack([x_global, x])


class AlternatingAttentionTransformer(nn.Module):
    """Alternating global/frame attention over multi-view token grids."""

    input_embed_dim: int
    depth: int = 24
    dim: int = 768
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_norm: bool = False
    init_values: Optional[float] = None
    distinguish_ref_and_non_ref_views: bool = True
    use_pe_for_non_reference_views: bool = False
    max_num_views_for_pe: int = 1000
    use_rand_idx_pe_for_non_reference_views: bool = True
    use_scalable_softmax: bool = False
    use_entropy_scaling: bool = False
    base_token_count_for_entropy_scaling: int = 444
    entropy_scaling_growth_factor: float = 1.4
    indices: Optional[Sequence[int]] = None  # intermediate taps (IFR)
    norm_intermediate: bool = True
    # Route global (even) layers through the explicit context-parallel
    # schedules when a parallel.cp context is active (view-sharded V*P grid
    # tokens + replicated scale token; see parallel/sharded_attention.py).
    context_parallel: bool = False
    remat: bool = False
    remat_policy: Optional[str] = None
    # Scan the (global, frame) layer pairs with nn.scan instead of a Python
    # loop over 24 distinct blocks. Same numerics (tests/test_scan_layers.py)
    # and a ~depth/2-fold smaller HLO; parameter layout differs (stacked
    # leading pair dim) — models.scan_repack converts both ways. Gated off
    # by default: converters/parity tests target the unrolled layout.
    scan_pairs: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        features: jnp.ndarray,
        additional_tokens: Optional[jnp.ndarray] = None,
        non_ref_view_pe_indices: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, list, Optional[jnp.ndarray]]:
        """
        Args:
            features: (B, V, h, w, Cin) fused per-view patch features.
            additional_tokens: optional (B, T, Cin) extra tokens (scale token).
            non_ref_view_pe_indices: optional (V-1,) int array of PE table
                rows for non-reference views (train-time random indices,
                reference :296-323). Defaults to arange(1, V).
            deterministic: disables dropout/droppath.

        Returns:
            (final (B, V, h, w, dim),
             intermediates: list of (B, V, h, w, dim) at ``indices``,
             additional_token_features: (B, T, dim) or None)
        """
        B, V, h, w, Cin = features.shape
        P = h * w
        T = 0 if additional_tokens is None else additional_tokens.shape[1]

        x = features.reshape(B, V * P, Cin)
        if additional_tokens is not None:
            x = jnp.concatenate([x, additional_tokens.astype(x.dtype)], axis=1)

        if self.input_embed_dim != self.dim:
            x = nn.Dense(
                self.dim,
                dtype=self.dtype,
                kernel_init=nn.initializers.xavier_uniform(),
                name="proj_embed",
            )(x)
        x = x.astype(self.dtype)

        # View positional encoding (sinusoid table, base 10000).
        if self.distinguish_ref_and_non_ref_views:
            n_rows = self.max_num_views_for_pe if self.use_pe_for_non_reference_views else 1
            table = jnp.asarray(sinusoid_encoding_table(n_rows, self.dim, 10000.0))
            ref_pe = table[0].astype(self.dtype)  # (dim,)
            x = x.at[:, :P, :].add(ref_pe)
            if self.use_pe_for_non_reference_views and V > 1:
                if non_ref_view_pe_indices is None:
                    non_ref_view_pe_indices = jnp.arange(1, V)
                non_ref_pe = table[non_ref_view_pe_indices].astype(self.dtype)  # (V-1, dim)
                non_ref_pe = jnp.repeat(non_ref_pe, P, axis=0)  # ((V-1)*P, dim)
                x = x.at[:, P : V * P, :].add(non_ref_pe)

        final_norm = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")

        take = set(self.indices or ())
        intermediates = []
        from mapanything_tpu.models.blocks import extra_tags_for_policy

        extra_tags = (
            extra_tags_for_policy(self.remat_policy) if self.remat else ()
        )

        if self.scan_pairs:
            assert self.depth % 2 == 0, "scan_pairs needs an even depth"
            scan_cls = nn.scan(
                _AlternatingPairBody,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True, "droppath": True},
                length=self.depth // 2,
            )
            x, stacked = scan_cls(
                dim=self.dim,
                num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias,
                qk_norm=self.qk_norm,
                init_values=self.init_values,
                use_scalable_softmax=self.use_scalable_softmax,
                use_entropy_scaling=self.use_entropy_scaling,
                base_token_count_for_entropy_scaling=self.base_token_count_for_entropy_scaling,
                entropy_scaling_growth_factor=self.entropy_scaling_growth_factor,
                context_parallel=self.context_parallel,
                num_views=V,
                tokens_per_view=P,
                extra_tokens=T,
                deterministic=deterministic,
                remat=self.remat,
                remat_policy=self.remat_policy,
                extra_tags=extra_tags,
                dtype=self.dtype,
                name="pairs",
            )(x, None)
            # stacked: (depth//2, 2, B, N, dim) -> per-layer (depth, B, N, dim)
            layers = stacked.reshape((self.depth,) + x.shape)
            for depth_idx in sorted(take):
                inter = layers[depth_idx]
                inter = final_norm(inter) if self.norm_intermediate else inter
                intermediates.append(
                    inter[:, : V * P, :].reshape(B, V, h, w, self.dim)
                )
            x = final_norm(x)
            view_features = x[:, : V * P, :].reshape(B, V, h, w, self.dim)
            additional_features = x[:, V * P :, :] if T else None
            return view_features, intermediates, additional_features

        block_cls = SelfAttentionBlock
        if self.remat:
            from mapanything_tpu.models.blocks import resolve_remat_policy

            block_cls = nn.remat(
                SelfAttentionBlock, static_argnums=(2,),
                policy=resolve_remat_policy(self.remat_policy),
            )
        for depth_idx in range(self.depth):
            block = block_cls(
                dim=self.dim,
                num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias,
                qk_norm=self.qk_norm,
                init_values=self.init_values,
                use_scalable_softmax=self.use_scalable_softmax,
                use_entropy_scaling=self.use_entropy_scaling,
                base_token_count_for_entropy_scaling=self.base_token_count_for_entropy_scaling,
                entropy_scaling_growth_factor=self.entropy_scaling_growth_factor,
                cp_global=self.context_parallel and depth_idx % 2 == 0,
                cp_extra_tokens=T,
                extra_tags=extra_tags,
                dtype=self.dtype,
                name=f"block_{depth_idx}",
            )
            if depth_idx % 2 == 0:
                # Global attention over all views (+ additional tokens).
                x = block(x, None, deterministic)
            else:
                # Frame-level attention; additional tokens bypass this layer.
                view_tok = x[:, : V * P, :].reshape(B * V, P, self.dim)
                view_tok = block(view_tok, None, deterministic)
                view_tok = view_tok.reshape(B, V * P, self.dim)
                if T:
                    x = jnp.concatenate([view_tok, x[:, V * P :, :]], axis=1)
                else:
                    x = view_tok

            if depth_idx in take:
                inter = final_norm(x) if self.norm_intermediate else x
                intermediates.append(
                    inter[:, : V * P, :].reshape(B, V, h, w, self.dim)
                )

        x = final_norm(x)
        view_features = x[:, : V * P, :].reshape(B, V, h, w, self.dim)
        additional_features = x[:, V * P :, :] if T else None
        return view_features, intermediates, additional_features
