"""ModularDUSt3R: 2-view DUSt3R re-implementation on the framework parts.

Parity: ``mapanything/models/mapanything/modular_dust3r.py:46,289``
(ModularDUSt3R, _encode_symmetrized): CroCo RoPE encoder on both views,
two cross-attention decoder branches (reference view + other view), DPT
heads per branch regressing pointmaps + confidence in view-0 frame.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Tuple

import flax.linen as nn
import flax.struct
import jax.numpy as jnp

from mapanything_tpu.models.encoders.croco import CroCoEncoder
from mapanything_tpu.models.heads.adaptors import (
    ConfidenceConfig,
    RangeConfig,
    adapt_confidence,
    adapt_pointmap,
)
from mapanything_tpu.models.heads.dpt import DPTFeature, DPTRegressionProcessor
from mapanything_tpu.models.info_sharing.cross_attention import (
    CrossAttentionTransformer,
)


@dataclass(frozen=True)
class ModularDUSt3RConfig:
    patch_size: int = 16
    enc_embed_dim: int = 1024
    enc_depth: int = 24
    enc_num_heads: int = 16
    dec_embed_dim: int = 768
    dec_depth: int = 12
    dec_num_heads: int = 12
    dpt_hooks: Tuple[int, ...] = (0, 1, 2, 3)
    dpt_feature_dim: int = 256
    dpt_layer_dims: Tuple[int, ...] = (96, 192, 384, 768)
    indices: Tuple[int, ...] = (2, 5, 8)  # decoder IFR taps + final
    pointmap: RangeConfig = field(default_factory=lambda: RangeConfig("exp"))
    confidence: ConfidenceConfig = field(default_factory=ConfidenceConfig)
    compute_dtype: str = "float32"


@flax.struct.dataclass
class DUSt3RPredictions:
    pts3d: jnp.ndarray  # (B, 2, H, W, 3) in view-0 frame
    conf: jnp.ndarray  # (B, 2, H, W)


class ModularDUSt3R(nn.Module):
    config: ModularDUSt3RConfig = ModularDUSt3RConfig()

    @nn.compact
    def __call__(
        self,
        views_img: jnp.ndarray,
        deterministic: bool = True,
        return_features: bool = False,
    ):
        """
        Args:
            views_img: (B, 2, H, W, 3) normalized image pair.
            return_features: also return the final decoder tokens
                (B, 2, h, w, dec_embed_dim).
        """
        cfg = self.config
        dtype = jnp.dtype(cfg.compute_dtype)
        B, V, H, W, _ = views_img.shape
        assert V == 2, "ModularDUSt3R is a 2-view model"
        h, w = H // cfg.patch_size, W // cfg.patch_size

        # Symmetrized pair encode (reference :289): both images through the
        # shared encoder in one batched call.
        encoder = CroCoEncoder(
            patch_size=cfg.patch_size,
            embed_dim=cfg.enc_embed_dim,
            depth=cfg.enc_depth,
            num_heads=cfg.enc_num_heads,
            dtype=dtype,
            name="encoder",
        )
        enc_feats = encoder(views_img.reshape(B * 2, H, W, 3), deterministic)
        enc_feats = enc_feats.reshape(B, 2, h, w, cfg.enc_embed_dim)

        decoder = CrossAttentionTransformer(
            input_embed_dim=cfg.enc_embed_dim,
            depth=cfg.dec_depth,
            dim=cfg.dec_embed_dim,
            num_heads=cfg.dec_num_heads,
            indices=cfg.indices,
            dtype=dtype,
            name="decoder",
        )
        dec_final, dec_inters = decoder(enc_feats, deterministic)

        # DPT heads per branch over [enc, inter0, inter1, final] features.
        n_ch = 3 + 1  # pts3d + conf
        outputs = []
        for branch in range(2):
            feats = [
                enc_feats[:, branch].astype(jnp.float32),
                dec_inters[0][:, branch].astype(jnp.float32),
                dec_inters[1][:, branch].astype(jnp.float32),
                dec_final[:, branch].astype(jnp.float32),
            ]
            dpt = DPTFeature(
                hooks=cfg.dpt_hooks,
                input_feature_dims=(cfg.enc_embed_dim,) + (cfg.dec_embed_dim,) * 3,
                layer_dims=cfg.dpt_layer_dims,
                feature_dim=cfg.dpt_feature_dim,
                name=f"dpt_head_{branch}",
            )
            reg = DPTRegressionProcessor(output_dim=n_ch, name=f"dpt_reg_{branch}")
            outputs.append(reg(dpt(feats), (H, W)))
        raw = jnp.stack(outputs, axis=1).astype(jnp.float32)  # (B, 2, H, W, 4)

        pts3d = adapt_pointmap(raw[..., :3], cfg.pointmap)
        conf = adapt_confidence(raw[..., 3:4], cfg.confidence)[..., 0]
        preds = DUSt3RPredictions(pts3d=pts3d, conf=conf)
        if return_features:
            # (B, 2, h, w, dec_dim) final decoder tokens, for feature
            # heads attached on top (e.g. the MASt3R descriptor head).
            return preds, dec_final
        return preds
