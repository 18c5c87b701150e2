"""Cosmos tokenizer image encoder — TPU-native architecture.

Parity: ``uniception/models/encoders/cosmos.py:12`` (CosmosEncoder) over
the vendored ``libs/cosmos_tokenizer`` continuous-image (CI) tokenizer
encoder (``modules/layers2d.py`` Encoder + ``modules/patching.py``
Patcher): haar-wavelet patching, conv-in at 128 channels, channel
multipliers [2, 4, 4] with strided downsampling to the requested
spatial compression, 2 residual blocks per level (GroupNorm + SiLU),
a mid block with single-head conv attention, and a 1x1 quant conv to
the 16-channel continuous latent.

Output matches the UniCeption contract: (B, H/ps, W/ps, latent_channels)
feature maps used as dense tokens.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax.numpy as jnp


def haar_downsample(x: jnp.ndarray) -> jnp.ndarray:
    """One 2D haar level, BIT-matching the reference Patcher._dwt
    (cosmos_tokenizer/modules/patching.py:71-94, rescale=True):
    channel order [LL, LH(vertical-high), HL(horizontal-high), HH],
    each scaled by g^2/2 (so LL is the 2x2 average)."""
    g2 = 0.7071067811865476 ** 2 / 2.0
    a, b = x[:, 0::2, 0::2], x[:, 0::2, 1::2]
    c, d = x[:, 1::2, 0::2], x[:, 1::2, 1::2]
    ll = a + b + c + d
    lh = a + b - c - d  # vertical high of horizontal low
    hl = a - b + c - d  # horizontal high of vertical low
    hh = a - b - c + d
    return jnp.concatenate([ll, lh, hl, hh], axis=-1) * g2


class Patcher2D(nn.Module):
    """Wavelet / rearrange patching (reference modules/patching.py:39)."""

    patch_size: int = 4
    method: str = "haar"

    def __call__(self, x):
        levels = int(math.log2(self.patch_size))
        assert 2**levels == self.patch_size, "patch_size must be a power of 2"
        if self.method == "haar":
            for _ in range(levels):
                x = haar_downsample(x)
            return x
        if self.method == "rearrange":
            B, H, W, C = x.shape
            p = self.patch_size
            x = x.reshape(B, H // p, p, W // p, p, C)
            return x.transpose(0, 1, 3, 2, 4, 5).reshape(
                B, H // p, W // p, p * p * C
            )
        raise ValueError(f"unknown patch method {self.method}")


class _ResBlock(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c_in = x.shape[-1]
        h = nn.GroupNorm(num_groups=min(32, c_in), dtype=self.dtype)(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype)(h)
        h = nn.GroupNorm(num_groups=min(32, self.out_channels), dtype=self.dtype)(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype)(h)
        if c_in != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype)(x)
        return x + h


class _ConvAttn(nn.Module):
    """Single-head conv attention (reference layers2d.py AttnBlock)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        h = nn.GroupNorm(num_groups=min(32, C), dtype=self.dtype)(x)
        q = nn.Conv(C, (1, 1), dtype=self.dtype, name="q")(h).reshape(B, H * W, C)
        k = nn.Conv(C, (1, 1), dtype=self.dtype, name="k")(h).reshape(B, H * W, C)
        v = nn.Conv(C, (1, 1), dtype=self.dtype, name="v")(h).reshape(B, H * W, C)
        attn = jnp.einsum("bqc,bkc->bqk", q, k) * (C**-0.5)
        attn = nn.softmax(attn.astype(jnp.float32), axis=-1).astype(v.dtype)
        out = jnp.einsum("bqk,bkc->bqc", attn, v).reshape(B, H, W, C)
        out = nn.Conv(C, (1, 1), dtype=self.dtype, name="proj_out")(out)
        return x + out


class CosmosEncoder(nn.Module):
    """Continuous-image tokenizer encoder (CI, latent 16 channels)."""

    patch_size: int = 8  # total spatial compression (8 or 16)
    patcher_size: int = 4
    patch_method: str = "haar"
    channels: int = 128
    channels_mult: tuple = (2, 4, 4)
    num_res_blocks: int = 2
    z_channels: int = 16
    latent_channels: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray, deterministic: bool = True):
        """images (B, H, W, 3) -> latent features (B, H/ps, W/ps, latent)."""
        assert self.patch_size % self.patcher_size == 0
        num_downsamples = int(math.log2(self.patch_size // self.patcher_size))
        assert 2**num_downsamples == self.patch_size // self.patcher_size

        x = Patcher2D(self.patcher_size, self.patch_method)(
            images.astype(self.dtype)
        )
        x = nn.Conv(
            self.channels, (3, 3), padding=1, dtype=self.dtype, name="conv_in"
        )(x)

        for level, mult in enumerate(self.channels_mult):
            out_ch = self.channels * mult
            for i in range(self.num_res_blocks):
                x = _ResBlock(
                    out_ch, dtype=self.dtype, name=f"res_{level}_{i}"
                )(x)
            if level < num_downsamples:
                # reference Downsample (layers2d.py:48): asymmetric
                # right/bottom zero pad + stride-2 VALID conv
                x = nn.Conv(
                    x.shape[-1], (3, 3), strides=(2, 2),
                    padding=((0, 1), (0, 1)),
                    dtype=self.dtype, name=f"down_{level}",
                )(x)

        # mid block: res + attn + res (reference layers2d.py Encoder)
        x = _ResBlock(x.shape[-1], dtype=self.dtype, name="mid_res1")(x)
        x = _ConvAttn(dtype=self.dtype, name="mid_attn")(x)
        x = _ResBlock(x.shape[-1], dtype=self.dtype, name="mid_res2")(x)

        x = nn.GroupNorm(num_groups=min(32, x.shape[-1]), dtype=self.dtype)(x)
        x = nn.silu(x)
        x = nn.Conv(
            self.z_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out"
        )(x)
        # quant conv (cosmos.py:49): 1x1 to the continuous latent
        return nn.Conv(
            self.latent_channels, (1, 1), dtype=self.dtype, name="quant_conv"
        )(x)
