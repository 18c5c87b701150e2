"""DPT dense prediction head: multi-level reassembly + fusion + regression.

Capability parity with ``uniception/models/prediction_heads/dpt.py:32,238``
and the vendored fusion blocks (``uniception/models/libs/croco/dpt_block.py``):
4 hooked feature levels are projected, resampled to a 4x/2x/1x/0.5x pyramid,
fused coarse-to-fine with residual conv units + 2x bilinear upsampling
(align_corners=True), then conv-decoded to output channels at full image
resolution.

Channel-last layout; every conv lowers onto the MXU, the bilinear resizes
are XLA gather-free `jax.image.resize` calls.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def _interp_matrix(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) align-corners linear interpolation matrix."""
    if n_out == 1 or n_in == 1:
        pos = np.zeros(n_out)
    else:
        pos = np.arange(n_out) * (n_in - 1) / (n_out - 1)
    i0 = np.clip(np.floor(pos).astype(np.int64), 0, n_in - 1)
    i1 = np.clip(i0 + 1, 0, n_in - 1)
    t = (pos - i0).astype(np.float32)
    mat = np.zeros((n_out, n_in), np.float32)
    mat[np.arange(n_out), i0] += 1.0 - t
    mat[np.arange(n_out), i1] += t
    return mat


def _resize_bilinear_align_corners(x: jnp.ndarray, out_hw) -> jnp.ndarray:
    """Bilinear resize matching torch's align_corners=True semantics.

    jax.image.resize implements half-pixel-centers (align_corners=False);
    align_corners=True maps corner pixels exactly. We apply dense
    (out, in) interpolation matrices on the MXU — on TPU this is 2-6x
    faster than the gather formulation (the gathers were the DPT head's
    dominant cost: 24.6 of 27.7 ms for the 296->518 C128 regressor resize
    at 8-view 518 px; the matmul form is 13.1 ms at HIGHEST precision,
    scripts/bench_dpt_parts.py). Matrices are static constants; HIGHEST
    precision keeps the two-tap convex combinations at fp32 accuracy
    (max |gather - matmul| = 1.4e-4 on N(0,1) features).
    """
    h, w = x.shape[-3:-1]
    oh, ow = out_hw
    if (h, w) == (oh, ow):
        return x
    # HIGHEST only matters for fp32 inputs (it decomposes the fp32 matmul
    # into bf16 passes losslessly; with bf16 inputs both precisions are
    # the same single MXU pass with fp32 accumulation). NOTE: a flattened
    # "oh,bhx->box" h-contraction measures 1.9x faster ISOLATED but 2%
    # slower inside the full model (the reshape breaks XLA's fusion with
    # the surrounding convs) — keep the fusable batched form.
    prec = (
        jax.lax.Precision.HIGHEST
        if x.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    out = x
    if oh != h:
        mh = jnp.asarray(_interp_matrix(h, oh), out.dtype)
        out = jnp.einsum("oh,...hwc->...owc", mh, out, precision=prec)
    if ow != w:
        mw = jnp.asarray(_interp_matrix(w, ow), out.dtype)
        out = jnp.einsum("pw,...hwc->...hpc", mw, out, precision=prec)
    return out


class StridedConvTranspose(nn.Module):
    """ConvTranspose2d with stride == kernel_size, as one matmul + pixel
    shuffle. Blocks don't overlap at stride==k, so the transposed conv is
    exactly ``out[b, i*k+a, j*k+c, o] = sum_i x[b,i,j,i'] w[a,c,o,i']`` — a
    single MXU contraction instead of XLA's general conv_transpose lowering
    (which cost ~+12 ms on the DPT head at 8-view 518 px). Parameter layout
    matches ``nn.ConvTranspose(transpose_kernel=True)``: kernel
    (k, k, out, in) + bias, so torch_convert trees load unchanged."""

    features: int
    kernel_size: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, cin = x.shape
        k = self.kernel_size
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (k, k, self.features, cin),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        y = jnp.einsum(
            "bhwi,acoi->bhwaco", x.astype(self.dtype), kernel.astype(self.dtype)
        )
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(
            b, h * k, w * k, self.features
        )
        return y + bias.astype(self.dtype)


class ResidualConvUnit(nn.Module):
    """Pre-activation residual conv unit (reference dpt_block.py:114)."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        out = nn.relu(x)
        out = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype, name="conv1")(out)
        out = nn.relu(out)
        out = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype, name="conv2")(out)
        return out + x


class FeatureFusionBlock(nn.Module):
    """Fusion block: optional skip merge, refine, 2x upsample, 1x1 out conv.

    Parity: ``FeatureFusionBlock_custom`` (reference dpt_block.py:180) with
    width_ratio=1; ``has_skip=False`` mirrors refinenet4 whose resConfUnit1
    is deleted.
    """

    features: int
    has_skip: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skip=None):
        out = x
        if skip is not None:
            res = ResidualConvUnit(self.features, self.dtype, name="res_conf_unit1")(skip)
            out = out + res
        out = ResidualConvUnit(self.features, self.dtype, name="res_conf_unit2")(out)
        oh, ow = out.shape[-3] * 2, out.shape[-2] * 2
        out = _resize_bilinear_align_corners(out, (oh, ow))
        out = nn.Conv(self.features, (1, 1), dtype=self.dtype, name="out_conv")(out)
        return out


class DPTFeature(nn.Module):
    """4-level reassemble + fusion -> 8x-upsampled feature map.

    Input: list of 4 feature maps (B, h, w, C_i) at the transformer patch
    resolution. Output: (B, 8h, 8w, feature_dim).
    """

    hooks: Sequence[int] = (0, 1, 2, 3)
    input_feature_dims: Sequence[int] = (1024, 768, 768, 768)
    layer_dims: Sequence[int] = (96, 192, 384, 768)
    feature_dim: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, list_features: Sequence[jnp.ndarray]) -> jnp.ndarray:
        layers = [list_features[h] for h in self.hooks]
        assert len(layers) == 4

        processed = []
        for idx, feat in enumerate(layers):
            feat = feat.astype(self.dtype)
            # 1x1 projection to the pyramid dim.
            y = nn.Conv(
                self.layer_dims[idx], (1, 1), dtype=self.dtype, name=f"act_{idx}_proj"
            )(feat)
            # Resample: 4x, 2x, 1x, 0.5x.
            if idx == 0:
                y = StridedConvTranspose(
                    self.layer_dims[0], 4, dtype=self.dtype, name="act_0_up4"
                )(y)
            elif idx == 1:
                y = StridedConvTranspose(
                    self.layer_dims[1], 2, dtype=self.dtype, name="act_1_up2"
                )(y)
            elif idx == 3:
                y = nn.Conv(
                    self.layer_dims[3], (3, 3), strides=(2, 2), padding=1,
                    dtype=self.dtype, name="act_3_down2",
                )(y)
            # Project to common fusion dim (make_scratch layer_rn, bias-free).
            y = nn.Conv(
                self.feature_dim, (3, 3), padding=1, use_bias=False,
                dtype=self.dtype, name=f"layer_{idx}_rn",
            )(y)
            processed.append(y)

        path_4 = FeatureFusionBlock(
            self.feature_dim, has_skip=False, dtype=self.dtype, name="refinenet4"
        )(processed[3])
        # Crop to match level-3 spatial dims (odd input sizes).
        path_4 = path_4[..., : processed[2].shape[-3], : processed[2].shape[-2], :]
        path_3 = FeatureFusionBlock(self.feature_dim, dtype=self.dtype, name="refinenet3")(
            path_4, processed[2]
        )
        path_2 = FeatureFusionBlock(self.feature_dim, dtype=self.dtype, name="refinenet2")(
            path_3, processed[1]
        )
        path_1 = FeatureFusionBlock(self.feature_dim, dtype=self.dtype, name="refinenet1")(
            path_2, processed[0]
        )
        return path_1


class DPTRegressionProcessor(nn.Module):
    """Decode the 8x feature map to ``output_dim`` channels at full res.

    Parity: reference dpt.py:238. conv1 -> bilinear(align_corners=True) to
    the image shape -> conv/relu/conv.
    """

    output_dim: int
    hidden_dims: Optional[Sequence[int]] = None
    dtype: jnp.dtype = jnp.float32
    # Dtype for the feature-space part (conv1 -> resize -> conv2_0+relu);
    # None -> ``dtype``. The final value-decoding 1x1 conv always runs at
    # ``dtype`` (fp32 by default, matching the reference's autocast-off
    # heads) — on TPU the feature convs at full 518px resolution are
    # HBM-bound, so bf16 feature storage halves the head's traffic while
    # the decode stays fp32.
    feature_dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, features: jnp.ndarray, output_shape_hw) -> jnp.ndarray:
        fdt = self.feature_dtype or self.dtype
        c = features.shape[-1]
        hidden = tuple(self.hidden_dims) if self.hidden_dims else (c // 2, c // 2)
        x = nn.Conv(hidden[0], (3, 3), padding=1, dtype=fdt, name="conv1")(features)
        x = _resize_bilinear_align_corners(x, output_shape_hw)
        x = nn.Conv(hidden[1], (3, 3), padding=1, dtype=fdt, name="conv2_0")(x)
        x = nn.relu(x)
        x = nn.Conv(self.output_dim, (1, 1), dtype=self.dtype, name="conv2_1")(x)
        return x


class DPTSegmentationProcessor(nn.Module):
    """Segmentation-style decoder over the 8x feature map (reference :314).

    conv3x3 + BN-free norm + ReLU + dropout-free + conv1x1, then bilinear
    to the target shape.
    """

    output_dim: int
    hidden_dim: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features: jnp.ndarray, output_shape_hw) -> jnp.ndarray:
        c = features.shape[-1]
        hidden = self.hidden_dim or c
        x = nn.Conv(hidden, (3, 3), padding=1, use_bias=False, dtype=self.dtype,
                    name="conv1")(features)
        x = nn.relu(x)
        x = nn.Conv(self.output_dim, (1, 1), dtype=self.dtype, name="conv2")(x)
        return _resize_bilinear_align_corners(x, output_shape_hw)
