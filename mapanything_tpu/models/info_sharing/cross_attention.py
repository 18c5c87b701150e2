"""Multi-view cross-attention transformer (DUSt3R-style decoder branches).

Parity: ``uniception/models/info_sharing/cross_attention_transformer.py:22``
(MultiViewCrossAttentionTransformer[IFR]): per-view decoder branches of
CrossAttentionBlocks where each view's tokens cross-attend to the
concatenated tokens of all other views; optional weight sharing between
the reference branch (view 0) and the non-reference branches.

The differential-attention variant of the reference
(``diff_cross_attention_transformer.py:22``,
DifferentialMultiViewCrossAttentionTransformer) is the same module with
``differential=True``: each branch block keeps standard self-attention but
cross-attends with noise-cancelling DiffCrossAttention, using half the
head count at the same per-head dim (reference passes ``num_heads // 2``
to DiffCrossAttentionBlock) and a per-layer lambda schedule.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from mapanything_tpu.models.blocks import CrossAttentionBlock


class CrossAttentionTransformer(nn.Module):
    input_embed_dim: int
    depth: int = 12
    dim: int = 768
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    share_non_reference_weights: bool = True  # one branch for all non-ref views
    indices: Optional[Sequence[int]] = None
    norm_intermediate: bool = True
    differential: bool = False  # DiffCrossAttention variant
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        features: jnp.ndarray,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, list]:
        """
        Args:
            features: (B, V, h, w, Cin).
        Returns:
            (final (B, V, h, w, dim), intermediates at ``indices``).
        """
        B, V, h, w, Cin = features.shape
        P = h * w
        x = features.reshape(B, V, P, Cin)
        if self.input_embed_dim != self.dim:
            x = nn.Dense(
                self.dim, dtype=self.dtype,
                kernel_init=nn.initializers.xavier_uniform(), name="proj_embed",
            )(x)
        x = x.astype(self.dtype)

        final_norm = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")
        take = set(self.indices or ())
        intermediates = []

        if self.differential:
            assert self.num_heads % 2 == 0, (
                "num_heads must be even for differential cross-attention"
            )
        # Differential blocks take the halved head count at the same
        # per-head dim (reference diff_cross_attention_transformer.py:118).
        heads = self.num_heads // 2 if self.differential else self.num_heads

        for layer in range(self.depth):
            ref_block = CrossAttentionBlock(
                dim=self.dim, num_heads=heads, mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias, differential=self.differential,
                layer_depth=layer, dtype=self.dtype, name=f"ref_block_{layer}",
            )
            non_ref_block = CrossAttentionBlock(
                dim=self.dim, num_heads=heads, mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias, differential=self.differential,
                layer_depth=layer, dtype=self.dtype,
                name=f"nonref_block_{layer}",
            ) if V > 1 else None

            new_views = []
            for v in range(V):
                # Context: all other views' tokens, concatenated.
                others = jnp.concatenate(
                    [x[:, u] for u in range(V) if u != v], axis=1
                ) if V > 1 else x[:, v]
                block = ref_block if (v == 0 or non_ref_block is None) else non_ref_block
                new_views.append(block(x[:, v], others, None, None, deterministic))
            x = jnp.stack(new_views, axis=1)

            if layer in take:
                inter = final_norm(x) if self.norm_intermediate else x
                intermediates.append(inter.reshape(B, V, h, w, self.dim))

        x = final_norm(x)
        return x.reshape(B, V, h, w, self.dim), intermediates
