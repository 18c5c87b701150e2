"""Multi-view global-attention transformer (VGGT-style ablation trunk).

Parity: ``uniception/models/info_sharing/global_attention_transformer.py:24``
(MultiViewGlobalAttentionTransformer[IFR]): every layer attends globally
over all views' tokens; per-view positional encoding from a
max_num_views-row sinusoid table (view 0 = reference).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from mapanything_tpu.models.blocks import SelfAttentionBlock
from mapanything_tpu.models.encoders.dense_rep import sinusoid_encoding_table


class GlobalAttentionTransformer(nn.Module):
    input_embed_dim: int
    depth: int = 24
    dim: int = 768
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    max_num_views_for_pe: int = 1000
    use_rand_idx_pe_for_non_reference_views: bool = True
    use_scalable_softmax: bool = False
    use_entropy_scaling: bool = False
    indices: Optional[Sequence[int]] = None
    norm_intermediate: bool = True
    remat: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        features: jnp.ndarray,
        additional_tokens: Optional[jnp.ndarray] = None,
        non_ref_view_pe_indices: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, list, Optional[jnp.ndarray]]:
        B, V, h, w, Cin = features.shape
        P = h * w
        T = 0 if additional_tokens is None else additional_tokens.shape[1]

        x = features.reshape(B, V * P, Cin)
        if additional_tokens is not None:
            x = jnp.concatenate([x, additional_tokens.astype(x.dtype)], axis=1)
        if self.input_embed_dim != self.dim:
            x = nn.Dense(
                self.dim, dtype=self.dtype,
                kernel_init=nn.initializers.xavier_uniform(), name="proj_embed",
            )(x)
        x = x.astype(self.dtype)

        table = jnp.asarray(
            sinusoid_encoding_table(self.max_num_views_for_pe, self.dim, 10000.0)
        )
        if non_ref_view_pe_indices is None:
            non_ref_view_pe_indices = jnp.arange(1, V)
        view_rows = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), non_ref_view_pe_indices.astype(jnp.int32)]
        )
        view_pe = table[view_rows].astype(self.dtype)  # (V, dim)
        pe = jnp.repeat(view_pe, P, axis=0)  # (V*P, dim)
        x = x.at[:, : V * P, :].add(pe)

        final_norm = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")
        take = set(self.indices or ())
        intermediates = []
        block_cls = SelfAttentionBlock
        if self.remat:
            block_cls = nn.remat(SelfAttentionBlock, static_argnums=(2,))
        for i in range(self.depth):
            x = block_cls(
                dim=self.dim,
                num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias,
                use_scalable_softmax=self.use_scalable_softmax,
                use_entropy_scaling=self.use_entropy_scaling,
                dtype=self.dtype,
                name=f"block_{i}",
            )(x, None, deterministic)
            if i in take:
                inter = final_norm(x) if self.norm_intermediate else x
                intermediates.append(inter[:, : V * P, :].reshape(B, V, h, w, self.dim))

        x = final_norm(x)
        view_features = x[:, : V * P, :].reshape(B, V, h, w, self.dim)
        additional_features = x[:, V * P :, :] if T else None
        return view_features, intermediates, additional_features
