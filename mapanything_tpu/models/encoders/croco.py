"""CroCo-style ViT encoder with 2D rotary position embedding.

Parity: ``uniception/models/encoders/croco.py:18,185`` (DUSt3R/MASt3R
encoder): conv patch embed (patch 16), no learned positional embedding —
RoPE2D applied inside every attention block (the reference's curope CUDA
extension; here ``mapanything_tpu.ops.rope``), pre-norm blocks, final norm.

Also provides ``PatchEmbedder`` (parity:
``uniception/models/encoders/patch_embedder.py:30``), the plain conv patch
embed used by ablations without a pretrained encoder.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from mapanything_tpu.models.blocks import SelfAttentionBlock
from mapanything_tpu.ops.rope import make_rope2d, patch_position_grid


class CroCoEncoder(nn.Module):
    """RoPE2D ViT encoder; returns (B, h, w, C) patch features."""

    patch_size: int = 16
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    mlp_ratio: float = 4.0
    rope_freq: float = 100.0
    dtype: jnp.dtype = jnp.float32
    return_layers: Optional[Sequence[int]] = None
    remat: bool = False

    @nn.compact
    def __call__(self, images: jnp.ndarray, deterministic: bool = True):
        B, H, W, _ = images.shape
        assert H % self.patch_size == 0 and W % self.patch_size == 0
        h, w = H // self.patch_size, W // self.patch_size

        x = nn.Conv(
            self.embed_dim,
            (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            dtype=self.dtype,
            name="patch_embed",
        )(images.astype(self.dtype))
        x = x.reshape(B, h * w, self.embed_dim)

        rope = make_rope2d(self.rope_freq)
        positions = patch_position_grid(B, h, w)

        return_set = set(self.return_layers or ())
        intermediates = []
        block_cls = SelfAttentionBlock
        if self.remat:
            block_cls = nn.remat(SelfAttentionBlock, static_argnums=(2,))
        for i in range(self.depth):
            x = block_cls(
                dim=self.embed_dim,
                num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio,
                qkv_bias=True,
                rope=rope,
                dtype=self.dtype,
                name=f"block_{i}",
            )(x, positions, deterministic)
            if i in return_set:
                intermediates.append(x.reshape(B, h, w, self.embed_dim))

        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        out = x.reshape(B, h, w, self.embed_dim)
        if self.return_layers is not None:
            return intermediates, out
        return out


class PatchEmbedder(nn.Module):
    """Plain conv patch embed + norm (reference patch_embedder.py:30)."""

    patch_size: int = 14
    embed_dim: int = 1024
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray, deterministic: bool = True):
        B, H, W, _ = images.shape
        h, w = H // self.patch_size, W // self.patch_size
        x = nn.Conv(
            self.embed_dim,
            (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            dtype=self.dtype,
            name="proj",
        )(images.astype(self.dtype))
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        return x.reshape(B, h, w, self.embed_dim)
