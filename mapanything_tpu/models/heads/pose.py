"""Pose, scale-MLP, and linear pixel-shuffle heads.

Parity: ``uniception/models/prediction_heads/pose_head.py:18,50``,
``mlp_head.py:13``, ``linear.py:15``. Channel-last.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class ResConvBlock(nn.Module):
    """1x1-conv residual block (Reloc3r/MaRePo style, reference :18)."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_channels = x.shape[-1]
        skip = (
            x
            if in_channels == self.out_channels
            else nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="head_skip")(x)
        )
        y = nn.relu(nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="res_conv1")(x))
        y = nn.relu(nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="res_conv2")(y))
        y = nn.relu(nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="res_conv3")(y))
        return skip + y


class PoseHead(nn.Module):
    """Patch features (B, h, w, C) -> (B, 3 + rot_dim) [trans, quat].

    Parity: reference pose_head.py:50 (proj -> ResConv blocks -> global
    avg-pool -> MLPs -> fc_t / fc_rot, concatenated [t, q]).
    """

    patch_size: int = 14
    num_resconv_block: int = 2
    rot_representation_dim: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feat: jnp.ndarray) -> jnp.ndarray:
        hidden = 4 * self.patch_size**2
        x = nn.Conv(hidden, (1, 1), dtype=self.dtype, name="proj")(feat.astype(self.dtype))
        for i in range(self.num_resconv_block):
            x = ResConvBlock(hidden, dtype=self.dtype, name=f"res_conv_{i}")(x)
        x = jnp.mean(x, axis=(-3, -2))  # adaptive avg-pool to (B, hidden)
        x = nn.relu(nn.Dense(hidden, dtype=self.dtype, name="mlp_0")(x))
        x = nn.relu(nn.Dense(hidden, dtype=self.dtype, name="mlp_1")(x))
        t = nn.Dense(3, dtype=self.dtype, name="fc_t")(x)
        rot = nn.Dense(self.rot_representation_dim, dtype=self.dtype, name="fc_rot")(x)
        return jnp.concatenate([t, rot], axis=-1)


class MLPHead(nn.Module):
    """Token MLP head: (B, T, C) -> (B, T, output_dim).

    Parity: reference mlp_head.py:13 (proj -> num_mlp_layers x
    [linear, relu] -> output proj). Used on the scale token.
    """

    output_dim: int = 1
    num_mlp_layers: int = 2
    hidden_dim: int = 196
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="proj")(tokens.astype(self.dtype))
        for i in range(self.num_mlp_layers):
            x = nn.relu(nn.Dense(self.hidden_dim, dtype=self.dtype, name=f"mlp_{i}")(x))
        return nn.Dense(self.output_dim, dtype=self.dtype, name="output_proj")(x)


class LinearFeature(nn.Module):
    """Pixel-shuffle linear unpatchify head (reference linear.py:15).

    (B, h, w, C) -> (B, h*P, w*P, output_dim).
    """

    output_dim: int
    patch_size: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feat: jnp.ndarray) -> jnp.ndarray:
        b, h, w, _ = feat.shape
        p = self.patch_size
        x = nn.Conv(self.output_dim * p * p, (1, 1), dtype=self.dtype, name="linear")(
            feat.astype(self.dtype)
        )
        # pixel shuffle (channel-last, torch F.pixel_shuffle channel order)
        x = x.reshape(b, h, w, self.output_dim, p, p)
        x = x.transpose(0, 1, 4, 2, 5, 3)  # (b, h, p, w, p, out)
        return x.reshape(b, h * p, w * p, self.output_dim)


class MLPFeature(nn.Module):
    """Linear unpatchify head with an MLP residual stage before the
    pixel-shuffle projection (reference
    uniception/models/prediction_heads/mlp_feature.py:16): tokens ->
    Mlp(4x) -> 1x1 conv to output_dim * P^2 -> pixel shuffle.

    (B, h, w, C) -> (B, h*P, w*P, output_dim).
    """

    output_dim: int
    patch_size: int
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feat: jnp.ndarray) -> jnp.ndarray:
        from mapanything_tpu.models.blocks import Mlp

        b, h, w, c = feat.shape
        x = Mlp(
            hidden_features=int(self.mlp_ratio * c),
            out_features=c,
            dtype=self.dtype,
            name="mlp",
        )(feat.astype(self.dtype))
        return LinearFeature(
            self.output_dim, self.patch_size, dtype=self.dtype, name="out"
        )(x)
