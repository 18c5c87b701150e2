"""MoGe-style residual conv decoder head ([FORK] feature).

Parity: ``uniception/models/prediction_heads/moge_conv.py:89``
(MoGeConvFeature): per-level 1x1 projections of multi-level transformer
features, a pyramid of 2x upsample + residual conv blocks with UV
coordinate injection, and per-output conv blocks. Channel-last flax.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp


def _uv_grid(b: int, h: int, w: int, dtype) -> jnp.ndarray:
    """Normalized UV coordinate channels (B, H, W, 2) in [-1, 1]."""
    v = jnp.linspace(-1.0, 1.0, h, dtype=dtype)[:, None]
    u = jnp.linspace(-1.0, 1.0, w, dtype=dtype)[None, :]
    uv = jnp.stack(
        [jnp.broadcast_to(u, (h, w)), jnp.broadcast_to(v, (h, w))], axis=-1
    )
    return jnp.broadcast_to(uv, (b, h, w, 2))


class ResidualConvBlock(nn.Module):
    """Conv residual block with GroupNorm (MoGe style)."""

    channels: int
    hidden: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.GroupNorm(num_groups=min(32, self.channels), dtype=self.dtype)(x)
        y = nn.relu(y)
        y = nn.Conv(self.hidden, (3, 3), padding=1, dtype=self.dtype, name="conv1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.channels, (3, 3), padding=1, dtype=self.dtype, name="conv2")(y)
        return x + y


class MoGeConvFeature(nn.Module):
    """Multi-level features -> full-res output channels, MoGe decoder style.

    Input: list of (B, h, w, C_i) features at the patch resolution.
    Output: (B, H, W, output_dim) at ``upsample factor 8`` then bilinear to
    the requested image shape.
    """

    output_dim: int
    dim_proj: int = 512
    dim_upsample: Sequence[int] = (256, 128, 64)
    num_res_blocks: int = 2
    dim_times_res_block_hidden: int = 2
    last_conv_channels: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, list_features, output_shape_hw: Tuple[int, int]):
        b, h, w, _ = list_features[0].shape

        # Project and sum all levels at patch resolution.
        x = 0.0
        for i, feat in enumerate(list_features):
            x = x + nn.Conv(
                self.dim_proj, (1, 1), dtype=self.dtype, name=f"project_{i}"
            )(feat.astype(self.dtype))

        # Upsample pyramid with UV injection (reference :129-143).
        for i, out_ch in enumerate(self.dim_upsample):
            bb, hh, ww, _ = x.shape
            x = jnp.concatenate([x, _uv_grid(bb, hh, ww, x.dtype)], axis=-1)
            x = nn.ConvTranspose(
                out_ch, (2, 2), strides=(2, 2), dtype=self.dtype,
                name=f"upsample_{i}_deconv", transpose_kernel=True,)(x)
            x = nn.Conv(
                out_ch, (3, 3), padding=1, dtype=self.dtype,
                name=f"upsample_{i}_conv",
            )(x)
            for j in range(self.num_res_blocks):
                x = ResidualConvBlock(
                    out_ch, self.dim_times_res_block_hidden * out_ch,
                    dtype=self.dtype, name=f"res_{i}_{j}",
                )(x)

        # Output block with UV injection.
        bb, hh, ww, _ = x.shape
        x = jnp.concatenate([x, _uv_grid(bb, hh, ww, x.dtype)], axis=-1)
        x = nn.Conv(
            self.last_conv_channels, (3, 3), padding=1, dtype=self.dtype,
            name="last_conv",
        )(x)
        x = nn.relu(x)
        x = nn.Conv(self.output_dim, (1, 1), dtype=self.dtype, name="out_proj")(x)

        # Resize to the exact image shape.
        from mapanything_tpu.models.heads.dpt import _resize_bilinear_align_corners

        return _resize_bilinear_align_corners(x, output_shape_hw)
