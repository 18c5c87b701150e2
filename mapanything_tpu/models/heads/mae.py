"""MAE-style transformer decoder head ([FORK] feature).

Parity: ``uniception/models/prediction_heads/mae.py:581``
(MAEGeneralDecoder + ViTMAEConfig): per-level linear embeddings of the
multi-level patch features, fixed 2D sin-cos positional embedding,
a stack of ViT decoder blocks, a final norm + linear prediction, and
unpatchify to full resolution. Used by the fork's masked-view-completion
RGB prediction head (configs/model/mapanything_mae_rgb.yaml).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from mapanything_tpu.models.blocks import SelfAttentionBlock


def sincos_2d_pos_embed(embed_dim: int, h: int, w: int) -> np.ndarray:
    """Fixed 2D sin-cos positional embedding (h*w, embed_dim), MAE style."""
    assert embed_dim % 4 == 0
    quarter = embed_dim // 4
    omega = 1.0 / (10000 ** (np.arange(quarter, dtype=np.float64) / quarter))
    gy, gx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")

    def enc(pos):
        out = np.einsum("n,d->nd", pos.reshape(-1).astype(np.float64), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    emb = np.concatenate([enc(gy), enc(gx)], axis=1)
    return emb.astype(np.float32)


class MAEGeneralDecoder(nn.Module):
    """Multi-level patch features -> per-pixel channels via a ViT decoder.

    Input: list of (B, h, w, C_i); output (B, h*P, w*P, output_dim).
    """

    output_dim: int
    patch_size: int = 14
    decoder_embed_dim: int = 512
    decoder_depth: int = 8
    decoder_num_heads: int = 16
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, list_features: Sequence[jnp.ndarray],
                 output_shape_hw: Tuple[int, int]) -> jnp.ndarray:
        b, h, w, _ = list_features[0].shape

        # Per-level linear embeds summed (reference: per-layer embeddings).
        x = 0.0
        for i, feat in enumerate(list_features):
            x = x + nn.Dense(
                self.decoder_embed_dim, dtype=self.dtype, name=f"embed_{i}"
            )(feat.astype(self.dtype)).reshape(b, h * w, self.decoder_embed_dim)

        pe = jnp.asarray(sincos_2d_pos_embed(self.decoder_embed_dim, h, w))
        x = x + pe.astype(self.dtype)

        for i in range(self.decoder_depth):
            x = SelfAttentionBlock(
                dim=self.decoder_embed_dim,
                num_heads=self.decoder_num_heads,
                mlp_ratio=self.mlp_ratio,
                qkv_bias=True,
                dtype=self.dtype,
                name=f"decoder_block_{i}",
            )(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="decoder_norm")(x)

        p = self.patch_size
        x = nn.Dense(
            self.output_dim * p * p, dtype=self.dtype, name="decoder_pred"
        )(x)
        # Unpatchify (B, h*w, out*p*p) -> (B, h*p, w*p, out)
        x = x.reshape(b, h, w, p, p, self.output_dim)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h * p, w * p, self.output_dim)

        if (h * p, w * p) != tuple(output_shape_hw):
            from mapanything_tpu.models.heads.dpt import (
                _resize_bilinear_align_corners,
            )

            x = _resize_bilinear_align_corners(x, output_shape_hw)
        return x
