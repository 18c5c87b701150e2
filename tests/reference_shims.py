"""Import helpers for the ACTUAL reference code at /root/reference.

The reference (xiaofeng218/map-anything, pure torch) imports a few packages
not present in this environment (omegaconf, torchvision, rerun/viser via
mapanything.utils.viz). This module installs minimal shims for exactly those
import-time dependencies so the reference's real modules — uniception
encoders/trunk/heads and mapanything/models/mapanything/model.py — can be
instantiated and run forward on CPU for numerical parity testing against
this framework's converted weights.

The shims only satisfy imports; no reference logic is replaced. The DINOv2
encoder's ``torch.hub.load`` call (uniception/models/encoders/dinov2.py:87)
is redirected to the reference's own vendored DINOv2
(mapanything/models/external/dinov2/hub/backbones.py) built with
``pretrained=False`` — the identical architecture torch hub would return,
just without the network fetch.
"""

from __future__ import annotations

import importlib.machinery
import os
import sys
import types

REFERENCE_ROOT = "/root/reference"

_installed = False


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_ROOT, "mapanything"))


def _fake_module(name: str) -> types.ModuleType:
    m = types.ModuleType(name)
    m.__spec__ = importlib.machinery.ModuleSpec(name, None)
    m.__version__ = "0.0.0"
    return m


def install_reference_path() -> None:
    """Install import shims and put /root/reference on sys.path (idempotent)."""
    global _installed
    if _installed:
        return

    if "omegaconf" not in sys.modules:
        om = _fake_module("omegaconf")

        class DictConfig(dict):
            pass

        class OmegaConf:
            _resolvers: dict = {}

            @staticmethod
            def has_resolver(name):
                return name in OmegaConf._resolvers

            @staticmethod
            def register_new_resolver(name, fn):
                OmegaConf._resolvers[name] = fn

            @staticmethod
            def to_container(cfg, resolve=True):
                return dict(cfg)

            @staticmethod
            def create(d):
                return DictConfig(d)

        om.DictConfig = DictConfig
        om.OmegaConf = OmegaConf
        sys.modules["omegaconf"] = om

    if "torchvision" not in sys.modules:
        tv = _fake_module("torchvision")
        tvt = _fake_module("torchvision.transforms")

        class RandomErasing:  # only instantiated when rgb_random_mask_prob set
            def __init__(self, *a, **k):
                pass

            def __call__(self, x):
                return x

        tvt.RandomErasing = RandomErasing
        tv.transforms = tvt
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tvt

    # mapanything.utils.viz pulls rerun/viser/trimesh; the model only needs
    # save_views_as_image (a debug dump). Pre-register a stub module.
    viz = _fake_module("mapanything.utils.viz")
    viz.save_views_as_image = lambda *a, **k: None
    sys.modules["mapanything.utils.viz"] = viz

    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    _installed = True


def patch_torch_hub_dinov2() -> None:
    """Redirect torch.hub.load('facebookresearch/dinov2', name) to the
    reference's vendored DINOv2 built with pretrained=False (idempotent)."""
    install_reference_path()
    import torch

    if getattr(torch.hub.load, "_mapanything_tpu_patched", False):
        return
    from mapanything.models.external.dinov2.hub import backbones

    _orig = torch.hub.load

    def _load(repo, name, *a, **k):
        if "dinov2" in str(repo):
            return getattr(backbones, name)(pretrained=False)
        return _orig(repo, name, *a, **k)

    _load._mapanything_tpu_patched = True
    torch.hub.load = _load


def make_reference_model_config(
    encoder_size: str = "small",
    info_sharing_depth: int = 4,
    info_sharing_dim: int = 256,
    info_sharing_num_heads: int = 4,
    info_sharing_indices=(1, 2),
    dpt_feature_dim: int = 64,
    dpt_layer_dims=(32, 48, 64, 96),
    patch_size: int = 14,
    use_geometric_inputs: bool = True,
):
    """Config dicts for the reference MapAnything at an arbitrary scale.

    Mirrors /root/reference/configs/inference.json (the production shape)
    with sizes overridable for CPU-scale parity tests. Probabilities are
    deterministic: 1.0 for every enabled modality, 0 dropout.
    """
    emb = {"small": 384, "base": 768, "large": 1024}[encoder_size]
    inf = float("inf")
    encoder_config = {
        "encoder_str": "dinov2",
        "name": f"dinov2_{encoder_size}",
        "data_norm_type": "dinov2",
        "size": encoder_size,
        "with_registers": False,
        "uses_torch_hub": True,
        "gradient_checkpointing": False,
    }
    on = 1.0 if use_geometric_inputs else 0.0
    geometric_input_config = {
        "overall_prob": on,
        "dropout_prob": 0.0 if use_geometric_inputs else 1.0,
        "ray_dirs_prob": on,
        "depth_prob": on,
        "cam_prob": on,
        "sparse_depth_prob": 0.0,
        "sparsification_removal_percent": 0.9,
        "depth_scale_norm_all_prob": 0.0,
        "pose_scale_norm_all_prob": 0.0,
        "ray_dirs_encoder_config": {
            "name": "ray_dirs_encoder",
            "in_chans": 3,
            "encoder_str": "dense_rep_encoder",
            "apply_pe": False,
        },
        "depth_encoder_config": {
            "name": "depth_encoder",
            "in_chans": 1,
            "encoder_str": "dense_rep_encoder",
            "apply_pe": False,
        },
        "cam_rot_encoder_config": {
            "name": "cam_rot_quats_encoder",
            "in_chans": 4,
            "encoder_str": "global_rep_encoder",
        },
        "cam_trans_encoder_config": {
            "name": "cam_trans_encoder",
            "in_chans": 3,
            "encoder_str": "global_rep_encoder",
        },
        "scale_encoder_config": {
            "name": "scale_encoder",
            "in_chans": 1,
            "encoder_str": "global_rep_encoder",
        },
    }
    info_sharing_config = {
        "model_type": "alternating_attention",
        "model_return_type": "intermediate_features",
        "custom_positional_encoding": None,
        "module_args": {
            "name": "aat_test_ifr",
            "indices": list(info_sharing_indices),
            "norm_intermediate": True,
            "size": "test",
            "depth": info_sharing_depth,
            "dim": info_sharing_dim,
            "num_heads": info_sharing_num_heads,
            "distinguish_ref_and_non_ref_views": True,
            "gradient_checkpointing": False,
        },
    }
    dense_adaptor = {
        "name": "raydirs+depth+pose+confidence+mask+scale",
        "ray_directions_mode": "linear",
        "ray_directions_normalize_to_unit_sphere": True,
        "ray_directions_normalize_to_unit_image_plane": False,
        "ray_directions_vmin": -inf,
        "ray_directions_vmax": inf,
        "ray_directions_clamp_min_of_z_dir": False,
        "ray_directions_z_dir_min": -inf,
        "depth_mode": "exp",
        "depth_vmin": 0,
        "depth_vmax": inf,
        "confidence_type": "exp",
        "confidence_vmin": 1,
        "confidence_vmax": inf,
    }
    pose_adaptor = {
        "name": "raydirs+depth+pose+confidence+mask+scale",
        "cam_trans_mode": "linear",
        "cam_trans_vmin": -inf,
        "cam_trans_vmax": inf,
        "quaternions_mode": "linear",
        "quaternions_normalize": True,
        "quaternions_vmin": -inf,
        "quaternions_vmax": inf,
    }
    scale_adaptor = {
        "name": "raydirs+depth+pose+confidence+mask+scale",
        "mode": "exp",
        "vmin": 1e-08,
        "vmax": inf,
    }
    pred_head_config = {
        "type": "dpt+pose",
        "adaptor_type": "raydirs+depth+pose+confidence+mask",
        "feature_head": {
            "feature_dim": dpt_feature_dim,
            "layer_dims": list(dpt_layer_dims),
            "hooks": [0, 1, 2, 3],
            "checkpoint_gradient": False,
        },
        "regressor_head": {
            "input_feature_dim": dpt_feature_dim,
            "output_dim": 6,
            "checkpoint_gradient": False,
        },
        "pose_head": {
            "num_resconv_block": 2,
            "rot_representation_dim": 4,
        },
        "scale_head": {
            "output_dim": 1,
        },
        "dpt_adaptor": dense_adaptor,
        "pose_adaptor": pose_adaptor,
        "scale_adaptor": scale_adaptor,
        "gradient_checkpointing": False,
    }
    return {
        "name": "mapanything",
        "encoder_config": encoder_config,
        "info_sharing_config": info_sharing_config,
        "pred_head_config": pred_head_config,
        "geometric_input_config": geometric_input_config,
    }


def make_reference_mapanything(**kwargs):
    """Instantiate the ACTUAL reference MapAnything at test scale (eval mode)."""
    install_reference_path()
    patch_torch_hub_dinov2()
    from mapanything.models.mapanything.model import MapAnything

    cfg = make_reference_model_config(**kwargs)
    model = MapAnything(**cfg)
    return model.eval()
