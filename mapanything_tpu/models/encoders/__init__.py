"""Encoder factory and registry.

Parity: ``uniception/models/encoders/__init__.py:25-105`` (ENCODER_CONFIGS
+ encoder_factory over 7 families: croco, dinov2, radio, cosmos,
patch_embedder, dense_rep_encoder, global_rep_encoder). All 7 families
are native architectures here; RADIO/Cosmos pretrained weights require
torch-hub access, so those start randomly initialized unless converted
parameters are supplied.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

from mapanything_tpu.models.encoders.cosmos import CosmosEncoder
from mapanything_tpu.models.encoders.croco import CroCoEncoder, PatchEmbedder
from mapanything_tpu.models.encoders.dense_rep import (
    DenseRepresentationEncoder,
    GlobalRepresentationEncoder,
)
from mapanything_tpu.models.encoders.radio import RADIOEncoder
from mapanything_tpu.models.encoders.vit import ViTEncoder

ENCODER_REGISTRY: Dict[str, Callable[..., Any]] = {
    "vit": ViTEncoder,
    "dinov2": ViTEncoder,  # DINOv2-style ViT (weights via utils.torch_convert)
    "croco": CroCoEncoder,
    "radio": RADIOEncoder,
    "cosmos": CosmosEncoder,
    "patch_embedder": PatchEmbedder,
    "dense_rep_encoder": DenseRepresentationEncoder,
    "global_rep_encoder": GlobalRepresentationEncoder,
}


def encoder_factory(encoder_str: str, **kwargs):
    """Build an encoder module by name (reference encoder_factory :61)."""
    if encoder_str not in ENCODER_REGISTRY:
        raise KeyError(
            f"unknown encoder '{encoder_str}'; available: "
            f"{sorted(ENCODER_REGISTRY)}"
        )
    return ENCODER_REGISTRY[encoder_str](**kwargs)
