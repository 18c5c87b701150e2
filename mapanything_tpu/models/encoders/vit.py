"""DINOv2-style ViT image encoder, the production image backbone.

Capability parity with the reference DINOv2 wrapper
(``uniception/models/encoders/dinov2.py:15,181``) and the underlying
vendored DINOv2 ViT (patch embed + cls token + interpolated pos embed +
pre-norm blocks with LayerScale + final norm, patch tokens out).

TPU-first notes:
  - channel-last (B, H, W, C) feature maps throughout — XLA's preferred
    layout; the patch embed is a strided conv that lowers onto the MXU;
  - weights are importable from torch DINOv2 checkpoints via
    ``mapanything_tpu.utils.torch_convert``;
  - the intermediate-feature-returner variant is a flag (``return_layers``),
    not a subclass.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import numpy as np
import jax.numpy as jnp

from mapanything_tpu.models.blocks import SelfAttentionBlock


class _ViTBlockBody(nn.Module):
    """One encoder block as an ``nn.scan`` body (``scan_blocks``).

    All blocks of the ViT are identical, so scanning them keeps one
    block's HLO in the program instead of ``depth`` unrolled copies —
    the compile-time cut that makes the driver's virtual-CPU flagship
    dryrun fit its clock. Numerics identical to the unrolled loop
    (tests/test_scan_layers.py); ``models.scan_repack`` converts the
    parameter layouts both ways.
    """

    dim: int
    num_heads: int
    init_values: float
    deterministic: bool
    remat: bool
    remat_policy: Optional[str]
    extra_tags: tuple
    emit_layers: bool
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x, _):
        from mapanything_tpu.models.blocks import resolve_remat_policy

        block_cls = SelfAttentionBlock
        if self.remat:
            block_cls = nn.remat(
                SelfAttentionBlock, static_argnums=(2,),
                policy=resolve_remat_policy(self.remat_policy),
            )
        x = block_cls(
            dim=self.dim,
            num_heads=self.num_heads,
            mlp_ratio=4.0,
            qkv_bias=True,
            init_values=self.init_values,
            extra_tags=self.extra_tags,
            dtype=self.dtype,
            name="block",
        )(x, None, self.deterministic)
        return x, (x if self.emit_layers else None)


VIT_SIZES = {
    # name: (embed_dim, depth, num_heads)
    "test": (64, 4, 4),  # unit-test scale
    "small": (384, 12, 6),
    "base": (768, 12, 12),
    "large": (1024, 24, 16),
    "giant": (1536, 40, 24),
}


def _torch_bicubic_matrix(n_in: int, n_out: int, scale: float) -> np.ndarray:
    """(n_out, n_in) matrix reproducing torch ``F.interpolate`` bicubic
    (align_corners=False, antialias=False, cubic A=-0.75) for a given
    effective scale factor (ATen maps src = (dst + 0.5) / scale - 0.5 and
    clamps the 4 taps to the border)."""
    A = -0.75

    def cubic(t):
        t = np.abs(t)
        return np.where(
            t <= 1.0,
            ((A + 2.0) * t - (A + 3.0)) * t * t + 1.0,
            np.where(t < 2.0, ((A * t - 5.0 * A) * t + 8.0 * A) * t - 4.0 * A, 0.0),
        )

    dst = np.arange(n_out, dtype=np.float64)
    src = (dst + 0.5) / scale - 0.5
    i0 = np.floor(src).astype(np.int64)
    t = src - i0
    mat = np.zeros((n_out, n_in), np.float64)
    for tap, off in enumerate((-1, 0, 1, 2)):
        idx = np.clip(i0 + off, 0, n_in - 1)
        wgt = cubic(t - off)
        np.add.at(mat, (np.arange(n_out), idx), wgt)
    return mat.astype(np.float32)


def interpolate_pos_embed(
    pos_embed: jnp.ndarray, h: int, w: int, interpolate_offset: float = 0.1
) -> jnp.ndarray:
    """Bicubic-resize a (1, N0, C) grid pos-embed to (1, h*w, C).

    Exactly mirrors DINOv2's ``interpolate_pos_encoding``
    (vendored vision_transformer.py:208): torch bicubic (A=-0.75,
    antialias=False) with the historical ``scale_factor=(n+0.1)/M`` kludge.
    Implemented as two static interpolation matrices contracted on the MXU
    (verified to 1e-6 against ``F.interpolate`` in
    tests/test_reference_parity.py).
    """
    n0 = pos_embed.shape[1]
    g0 = int(round(n0**0.5))
    if g0 * g0 != n0:
        raise ValueError(f"pos_embed length {n0} is not a square grid")
    if (g0, g0) == (h, w):
        return pos_embed
    c = pos_embed.shape[-1]
    grid = pos_embed.reshape(g0, g0, c)
    mh = jnp.asarray(
        _torch_bicubic_matrix(g0, h, (h + interpolate_offset) / g0), grid.dtype
    )
    mw = jnp.asarray(
        _torch_bicubic_matrix(g0, w, (w + interpolate_offset) / g0), grid.dtype
    )
    prec = jax.lax.Precision.HIGHEST if grid.dtype == jnp.float32 else None
    out = jnp.einsum("oh,hwc->owc", mh, grid, precision=prec)
    out = jnp.einsum("pw,hwc->hpc", mw, out, precision=prec)
    return out.reshape(1, h * w, c)


class ViTEncoder(nn.Module):
    """Plain ViT feature extractor with cls token and learned pos embed.

    Returns normalized patch tokens as (B, H/P, W/P, C); optionally also the
    outputs of ``return_layers`` (the IFR variant,
    reference ``dinov2.py:181``, ``intermediate_feature_return.py:19``).
    """

    size: str = "large"
    patch_size: int = 14
    pos_embed_grid: int = 37  # 518 / 14; DINOv2's training grid
    init_values: float = 1e-5  # LayerScale
    num_register_tokens: int = 0
    dtype: jnp.dtype = jnp.float32
    return_layers: Optional[Sequence[int]] = None
    remat: bool = False
    remat_policy: Optional[str] = None
    # nn.scan over the (identical) blocks instead of a Python loop — same
    # numerics, ~depth-fold smaller HLO, stacked parameter layout (see
    # models.scan_repack). Gated off by default (converters/parity tests
    # target the unrolled layout).
    scan_blocks: bool = False

    @property
    def embed_dim(self) -> int:
        return VIT_SIZES[self.size][0]

    @nn.compact
    def __call__(self, images: jnp.ndarray, deterministic: bool = True):
        """
        Args:
            images: (B, H, W, 3) normalized images, H, W divisible by patch.

        Returns:
            (B, h, w, C) final patch features, or (list of intermediates,
            final) when ``return_layers`` is set.
        """
        embed_dim, depth, num_heads = VIT_SIZES[self.size]
        B, H, W, _ = images.shape
        assert H % self.patch_size == 0 and W % self.patch_size == 0
        h, w = H // self.patch_size, W // self.patch_size

        x = nn.Conv(
            embed_dim,
            (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            dtype=self.dtype,
            name="patch_embed",
        )(images.astype(self.dtype))
        x = x.reshape(B, h * w, embed_dim)

        pos_embed = self.param(
            "pos_embed",
            nn.initializers.truncated_normal(0.02),
            (1, self.pos_embed_grid * self.pos_embed_grid + 1, embed_dim),
        )
        cls_pe, patch_pe = pos_embed[:, :1], pos_embed[:, 1:]
        patch_pe = interpolate_pos_embed(patch_pe, h, w)
        x = x + patch_pe.astype(self.dtype)

        cls_token = self.param(
            "cls_token", nn.initializers.truncated_normal(0.02), (1, 1, embed_dim)
        )
        tokens = [jnp.broadcast_to(cls_token + cls_pe, (B, 1, embed_dim)).astype(self.dtype)]
        if self.num_register_tokens:
            reg = self.param(
                "register_tokens",
                nn.initializers.truncated_normal(0.02),
                (1, self.num_register_tokens, embed_dim),
            )
            tokens.append(
                jnp.broadcast_to(reg, (B, self.num_register_tokens, embed_dim)).astype(self.dtype)
            )
        tokens.append(x)
        x = jnp.concatenate(tokens, axis=1)
        n_prefix = 1 + self.num_register_tokens

        return_set = set(self.return_layers or ())
        intermediates = []
        from mapanything_tpu.models.blocks import extra_tags_for_policy

        extra_tags = (
            extra_tags_for_policy(self.remat_policy) if self.remat else ()
        )

        if self.scan_blocks:
            scan_cls = nn.scan(
                _ViTBlockBody,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True, "droppath": True},
                length=depth,
            )
            x, stacked = scan_cls(
                dim=embed_dim,
                num_heads=num_heads,
                init_values=self.init_values,
                deterministic=deterministic,
                remat=self.remat,
                remat_policy=self.remat_policy,
                extra_tags=extra_tags,
                emit_layers=bool(return_set),
                dtype=self.dtype,
                name="blocks",
            )(x, None)
            for i in sorted(return_set):
                intermediates.append(
                    stacked[i][:, n_prefix:].reshape(B, h, w, embed_dim)
                )
            x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
            patch_tokens = x[:, n_prefix:].reshape(B, h, w, embed_dim)
            if self.return_layers is not None:
                return intermediates, patch_tokens
            return patch_tokens

        block_cls = SelfAttentionBlock
        if self.remat:
            from mapanything_tpu.models.blocks import resolve_remat_policy

            block_cls = nn.remat(
                SelfAttentionBlock, static_argnums=(2,),
                policy=resolve_remat_policy(self.remat_policy),
            )
        for i in range(depth):
            x = block_cls(
                dim=embed_dim,
                num_heads=num_heads,
                mlp_ratio=4.0,
                qkv_bias=True,
                init_values=self.init_values,
                extra_tags=extra_tags,
                dtype=self.dtype,
                name=f"block_{i}",
            )(x, None, deterministic)
            if i in return_set:
                feats = x[:, n_prefix:].reshape(B, h, w, embed_dim)
                intermediates.append(feats)

        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        patch_tokens = x[:, n_prefix:].reshape(B, h, w, embed_dim)

        if self.return_layers is not None:
            return intermediates, patch_tokens
        return patch_tokens
