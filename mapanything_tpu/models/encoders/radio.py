"""RADIO encoder — TPU-native architecture.

Parity: ``uniception/models/encoders/radio.py:13`` (RADIOEncoder), which
wraps NVIDIA's torch-hub RADIO (agnostic ViT distilled from multiple
foundation teachers). At feature-extraction time RADIO is a ViT that
consumes conditioned images and returns (summary, spatial features);
the UniCeption wrapper reshapes spatial features to (B, C, h, w)
(radio.py:96-118).

This native version reproduces that contract with this framework's
``ViTEncoder`` backbone: per-version embed dims (radio.py:53-59),
patch 16 (14 for v2.5-g), CLIP-statistics input conditioning, and
(B, h, w, C) spatial features (channels-last, the JAX layout). Upstream
weights require torch-hub access; the architecture accepts converted
parameters via the standard flax param tree.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from mapanything_tpu.models.encoders.vit import ViTEncoder

# reference radio.py:53-59
RADIO_EMBED_DIMS = {
    "radio_v2.5-b": "base",
    "radio_v2.5-l": "large",
    "radio_v2.5-h": "huge",
    "radio_v2.5-g": "giant",
    "e-radio_v2": "base",
}
# CLIP input statistics (RADIO's input conditioner normalization)
_CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
_CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


class RADIOEncoder(nn.Module):
    """ViT feature extractor with RADIO's conditioning and shape contract."""

    model_version: str = "radio_v2.5-l"
    patch_size: int = 16
    # Grid of the TRAINED positional-embedding table (the parameter shape;
    # run-time grids interpolate from it). 37 = DINOv2's 518/14 table, the
    # layout RADIO checkpoints ship. Deriving this from the input size
    # breaks loading converted checkpoints at non-native resolutions.
    pos_embed_grid: int = 37
    return_layers: Optional[Sequence[int]] = None
    size_override: Optional[str] = None  # for unit-test scale
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray, deterministic: bool = True):
        """images (B, H, W, 3) in [0, 1] -> (B, h, w, C) spatial features
        (plus intermediates when return_layers is set)."""
        if self.model_version == "radio_v2.5-g":
            assert self.patch_size == 14, "v2.5-g uses patch 14"
        size = self.size_override or RADIO_EMBED_DIMS[self.model_version]
        # "huge" is not in VIT_SIZES; map to nearest provided scale.
        if size == "huge":
            size = "giant"

        mean = jnp.asarray(_CLIP_MEAN, self.dtype)
        std = jnp.asarray(_CLIP_STD, self.dtype)
        x = (images.astype(self.dtype) - mean) / std
        return ViTEncoder(
            size=size,
            patch_size=self.patch_size,
            pos_embed_grid=self.pos_embed_grid,
            return_layers=self.return_layers,
            dtype=self.dtype,
            name="backbone",
        )(x, deterministic)
