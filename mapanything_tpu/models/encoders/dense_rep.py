"""Dense-representation encoder: patchify dense geometric inputs to tokens.

Parity: ``uniception/models/encoders/dense_rep_encoder.py:31-180``
(pixel-unshuffle + conv-in + residual blocks + 1x1 projection + LayerNorm +
interpolated sinusoid positional encoding + post-PE norm). Used for ray
directions (3ch) and normalized log-depth (1ch).

Channel-last layout; the pixel-unshuffle is a reshape/transpose that XLA
fuses into the following conv.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def sinusoid_encoding_table(n_position: int, d_hid: int, base: float) -> np.ndarray:
    """Sinusoid table matching the reference's construction (base 70007)."""
    position = np.arange(n_position)[:, None]
    div = np.power(base, 2 * (np.arange(d_hid) // 2) / d_hid)[None, :]
    table = position / div
    table[:, 0::2] = np.sin(table[:, 0::2])
    table[:, 1::2] = np.cos(table[:, 1::2])
    return table.astype(np.float32)


def pixel_unshuffle(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/f, W/f, C*f*f), channel-last PixelUnshuffle.

    Channel ordering matches torch's ``nn.PixelUnshuffle`` on NCHW inputs
    (c-major, then row, then col) so converted weights stay compatible.
    """
    b, h, w, c = x.shape
    x = x.reshape(b, h // factor, factor, w // factor, factor, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # (b, h', w', c, fh, fw)
    return x.reshape(b, h // factor, w // factor, c * factor * factor)


class ResidualBlock(nn.Module):
    """Conv residual block (reference dense_rep_encoder.py:31)."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_channels = x.shape[-1]
        identity = (
            nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="shortcut")(x)
            if in_channels != self.out_channels
            else x
        )
        out = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv1")(x)
        out = nn.gelu(out, approximate=False)
        out = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv2")(out)
        return nn.gelu(out + identity, approximate=False)


class DenseRepresentationEncoder(nn.Module):
    """Patchify a dense (B, H, W, Cin) map into (B, H/P, W/P, embed) tokens."""

    in_chans: int = 3
    enc_embed_dim: int = 1024
    patch_size: int = 14
    intermediate_dims: Sequence[int] = (588, 768, 1024)
    apply_pe: bool = True
    input_size_for_pe: int = 518
    pe_base: float = 70007.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        assert x.shape[-1] == self.in_chans
        b, h, w, _ = x.shape
        ph, pw = h // self.patch_size, w // self.patch_size

        x = pixel_unshuffle(x.astype(self.dtype), self.patch_size)
        x = nn.Conv(
            self.intermediate_dims[0], (3, 3), padding=1, dtype=self.dtype, name="conv_in"
        )(x)
        for i in range(len(self.intermediate_dims) - 1):
            x = ResidualBlock(
                self.intermediate_dims[i + 1], dtype=self.dtype, name=f"res_{i}"
            )(x)
        x = nn.Conv(self.enc_embed_dim, (1, 1), dtype=self.dtype, name="proj")(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)

        if self.apply_pe:
            grid = self.input_size_for_pe // self.patch_size
            table = sinusoid_encoding_table(grid * grid, self.enc_embed_dim, self.pe_base)
            pe = jnp.asarray(table).reshape(1, grid, grid, self.enc_embed_dim)
            if (grid, grid) != (ph, pw):
                pe = jax.image.resize(
                    pe, (1, ph, pw, self.enc_embed_dim), method="bicubic"
                )
            x = x + pe.astype(self.dtype)
            x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="post_pe_norm")(x)
        return x


class GlobalRepresentationEncoder(nn.Module):
    """MLP-encode a global vector (B, Cin) to (B, embed).

    Parity: ``uniception/models/encoders/global_rep_encoder.py:14``.
    Used for pose quats (4), pose translation (3), and log-scale (1) tokens.
    """

    in_chans: int = 3
    enc_embed_dim: int = 1024
    intermediate_dims: Sequence[int] = (128, 256, 512)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        assert x.shape[-1] == self.in_chans
        x = x.astype(self.dtype)
        for i, d in enumerate(self.intermediate_dims):
            x = nn.Dense(d, dtype=self.dtype, name=f"fc_{i}")(x)
            x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.enc_embed_dim, dtype=self.dtype, name="fc_out")(x)
        return nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
