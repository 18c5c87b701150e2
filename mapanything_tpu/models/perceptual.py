"""VGG19 perceptual feature extractor for the [FORK] RGB perception loss.

Parity: ``mapanything/train/losses.py:467-532`` (``PerceptualLoss``): a
torchvision VGG19 (ImageNet weights) with every max-pool replaced by a
2x2 average pool, split into five feature blocks at torchvision
``features`` indices [0, 4, 9, 14, 23, 32] (i.e. relu1_2, relu2_2,
relu3_2, relu4_2, relu5_2 outputs), compared with fixed per-layer L1
weights. Inputs are RGB in [0, 1], preprocessed to Caffe-style
``x * 255 - mean`` (no std division, RGB channel order kept).

TPU-native design: one flax module returning all five taps in a single
forward (the reference runs the blocks sequentially anyway); avg-pool and
convs run in the requested compute dtype (bf16-safe — the loss weighting
happens in fp32). Weights load from a torchvision ``vgg19`` state dict
via :func:`mapanything_tpu.utils.torch_convert.convert_vgg19_features`.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

# torchvision VGG19 ``features`` layout: conv channel widths with 'M' the
# pooling positions (public VGG-19 configuration "E").
VGG19_LAYOUT = (
    64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
    512, 512, 512, 512, "M", 512, 512, 512, 512, "M",
)

# Block boundaries from the reference (losses.py:488): torchvision
# ``features`` indices where each perceptual tap ends (exclusive).
FEATURE_TAPS = (4, 9, 14, 23, 32)

# Caffe-style preprocessing mean, RGB order (losses.py:507).
VGG_MEAN_RGB = (123.680, 116.779, 103.939)

# Reference per-level loss weights e0..e5 (losses.py:519-524):
# pixel term + five feature terms, all finally divided by 255.
PERCEPTUAL_LEVEL_WEIGHTS = (1.0, 1.0 / 2.6, 1.0 / 4.8, 1.0 / 3.7, 1.0 / 5.6, 10.0 / 1.5)


def _torchvision_feature_indices():
    """Map each conv in VGG19_LAYOUT to its torchvision ``features`` index.

    Only convs consumed by the perceptual taps are listed (a conv at
    index i is used iff its ReLU at i+1 is below the last tap boundary),
    so conv5_3/conv5_4 (torchvision indices 32, 34) are excluded.
    """
    indices, i = [], 0
    for entry in VGG19_LAYOUT:
        if entry == "M":
            i += 1  # pool occupies one slot
        else:
            if i + 2 <= FEATURE_TAPS[-1]:
                indices.append(i)
            i += 2  # conv + ReLU
    return indices


VGG19_CONV_INDICES = tuple(_torchvision_feature_indices())


class VGG19Features(nn.Module):
    """VGG19 conv tower (avg-pool variant) returning the five reference taps.

    Input: (..., H, W, 3) RGB in [0, 1]. Output: list of five feature maps
    at strides 1, 2, 4, 8, 16 (relu1_2 .. relu5_2), plus the preprocessed
    pixels as element 0 of the returned list — matching the reference's
    e0..e5 terms which compare the preprocessed images directly at level 0.
    """

    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, images: jnp.ndarray):
        dt = jnp.dtype(self.compute_dtype)
        mean = jnp.asarray(VGG_MEAN_RGB, jnp.float32)
        x = images.astype(jnp.float32) * 255.0 - mean
        taps = [x]  # level 0: preprocessed pixels (reference e0)
        x = x.astype(dt)
        tap_set = set(FEATURE_TAPS)
        feat_idx = 0
        conv_pos = 0
        for entry in VGG19_LAYOUT:
            if entry == "M":
                # Reference swaps MaxPool2d -> AvgPool2d(2, 2) (losses.py:483).
                x = nn.avg_pool(x, (2, 2), strides=(2, 2))
                feat_idx += 1
            else:
                tv_index = VGG19_CONV_INDICES[conv_pos]
                x = nn.Conv(
                    entry, (3, 3), padding=1, dtype=dt,
                    name=f"conv{tv_index}",
                )(x)
                x = nn.relu(x)
                conv_pos += 1
                feat_idx += 2
            if feat_idx in tap_set:
                taps.append(x)
                tap_set.discard(feat_idx)
            if not tap_set:
                break
        return taps


def perceptual_distance(taps_a, taps_b) -> jnp.ndarray:
    """Per-sample perceptual distance from two tap lists (losses.py:519-526).

    Each tap is (B, H, W, C); returns (B,) fp32. The weighted sum of
    per-level mean-|diff| terms, divided by 255 as in the reference.
    """
    total = None
    for w, a, b in zip(PERCEPTUAL_LEVEL_WEIGHTS, taps_a, taps_b):
        e = jnp.mean(
            jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)),
            axis=(-3, -2, -1),
        ) * w
        total = e if total is None else total + e
    return total / 255.0
