"""Model registry/factory: string name -> model constructor.

Parity: ``mapanything/models/__init__.py:41,62`` (init_model,
MODEL_CONFIGS/model_factory). External-model wrappers (VGGT, MoGe, Pi3, ...,
reference models/external/) require their upstream pip checkpoints which
this environment cannot fetch; their registry slots raise with a clear
message so config parity is visible.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

from mapanything_tpu.models.mapanything import MapAnything, MapAnythingConfig
from mapanything_tpu.models.modular_dust3r import ModularDUSt3R, ModularDUSt3RConfig

MODEL_REGISTRY: Dict[str, Callable[..., Any]] = {}


def register_model(name: str):
    def deco(fn):
        MODEL_REGISTRY[name] = fn
        return fn

    return deco


@register_model("mapanything")
def _build_mapanything(**overrides):
    cfg = MapAnythingConfig(**overrides) if overrides else MapAnythingConfig()
    return MapAnything(cfg)


@register_model("mapanything_ablations")
def _build_mapanything_ablations(scene_rep_type: str = "pointmap", **overrides):
    """Ablation variant supporting alternative scene reps
    (reference mapanything/models/mapanything/ablations.py:78). The unified
    MapAnything covers every scene-rep family via its config, so the
    ablations model is a config preset here."""
    from mapanything_tpu.models.heads.adaptors import (
        DenseAdaptorConfig,
        dense_components_for_scene_rep,
    )

    cfg = MapAnythingConfig(
        scene_rep_type=scene_rep_type,
        dense_adaptor=DenseAdaptorConfig(
            components=dense_components_for_scene_rep(scene_rep_type),
            with_confidence=overrides.pop("with_confidence", True),
            with_mask=overrides.pop("with_mask", True),
        ),
        **overrides,
    )
    return MapAnything(cfg)


@register_model("modular_dust3r")
def _build_modular_dust3r(**overrides):
    cfg = ModularDUSt3RConfig(**overrides) if overrides else ModularDUSt3RConfig()
    return ModularDUSt3R(cfg)


@register_model("vggt")
def _build_vggt(size: str = "full", **overrides):
    """Native VGGT baseline (reference external/vggt/, arXiv:2503.11651).

    Weights: upstream facebook/VGGT-1B checkpoints require network access;
    this builds the architecture (random init or your converted params).
    """
    from mapanything_tpu.models.external.vggt import VGGTConfig, VGGTWrapper

    cfg = (
        VGGTConfig.small(**overrides) if size == "small"
        else VGGTConfig(**overrides)
    )
    return VGGTWrapper(cfg)


@register_model("moge")
@register_model("moge_1")
def _build_moge(size: str = "full", **overrides):
    """Native MoGe v1 baseline (reference external/moge/, arXiv:2410.19115;
    registered as both "moge" and the reference factory's "moge_1",
    models/__init__.py:62-110)."""
    from mapanything_tpu.models.external.moge import MoGeConfig, MoGeWrapper

    cfg = (
        MoGeConfig.small(**overrides) if size == "small"
        else MoGeConfig(**overrides)
    )
    return MoGeWrapper(cfg)


@register_model("pi3")
def _build_pi3(size: str = "full", **overrides):
    """Native Pi3 baseline (reference external/pi3/, arXiv:2507.13347)."""
    from mapanything_tpu.models.external.pi3 import Pi3Config, Pi3Wrapper

    cfg = (
        Pi3Config.small(**overrides) if size == "small"
        else Pi3Config(**overrides)
    )
    return Pi3Wrapper(cfg)


@register_model("anycalib")
def _build_anycalib(size: str = "full", **overrides):
    """Native AnyCalib baseline (reference external/anycalib/)."""
    from mapanything_tpu.models.external.anycalib import (
        AnyCalibConfig,
        AnyCalibWrapper,
    )

    cfg = (
        AnyCalibConfig.small(**overrides) if size == "small"
        else AnyCalibConfig(**overrides)
    )
    return AnyCalibWrapper(cfg)


@register_model("dust3r_ba")
def _build_dust3r_ba(size: str = "full", **kwargs):
    """Native DUSt3R + global alignment (reference external/dust3r/)."""
    from mapanything_tpu.models.external.dust3r_ba import DUSt3RBAWrapper
    from mapanything_tpu.models.modular_dust3r import ModularDUSt3RConfig

    cfg_kw = {k: v for k, v in kwargs.items() if k in
              ModularDUSt3RConfig.__dataclass_fields__}
    wrap_kw = {k: v for k, v in kwargs.items() if k not in cfg_kw}
    if size == "small":
        cfg_kw.setdefault("enc_embed_dim", 64)
        cfg_kw.setdefault("enc_depth", 2)
        cfg_kw.setdefault("enc_num_heads", 4)
        cfg_kw.setdefault("dec_embed_dim", 64)
        cfg_kw.setdefault("dec_depth", 2)
        cfg_kw.setdefault("dec_num_heads", 4)
        cfg_kw.setdefault("dpt_feature_dim", 32)
        cfg_kw.setdefault("dpt_layer_dims", (16, 32, 48, 64))
        cfg_kw.setdefault("indices", (0, 0, 1))
    return DUSt3RBAWrapper(ModularDUSt3RConfig(**cfg_kw), **wrap_kw)


@register_model("pow3r")
def _build_pow3r(size: str = "full", **overrides):
    """Native Pow3R baseline (reference external/pow3r/, arXiv:2503.17316)."""
    from mapanything_tpu.models.external.pow3r import Pow3RConfig, Pow3RWrapper

    cfg = (
        Pow3RConfig.small(**overrides) if size == "small"
        else Pow3RConfig(**overrides)
    )
    return Pow3RWrapper(cfg)


@register_model("pow3r_ba")
def _build_pow3r_ba(size: str = "full", **kwargs):
    """Native Pow3R + global alignment (reference external/pow3r/:580)."""
    from mapanything_tpu.models.external.pow3r import (
        Pow3RBAWrapper,
        Pow3RConfig,
    )

    cfg_kw = {k: v for k, v in kwargs.items()
              if k in Pow3RConfig.__dataclass_fields__}
    wrap_kw = {k: v for k, v in kwargs.items() if k not in cfg_kw}
    cfg = Pow3RConfig.small(**cfg_kw) if size == "small" else Pow3RConfig(**cfg_kw)
    return Pow3RBAWrapper(cfg, **wrap_kw)


@register_model("must3r")
def _build_must3r(size: str = "full", **overrides):
    """Native MUSt3R baseline (reference external/must3r/, arXiv:2503.01661)."""
    from mapanything_tpu.models.external.must3r import (
        MUSt3RConfig,
        MUSt3RWrapper,
    )

    cfg = (
        MUSt3RConfig.small(**overrides) if size == "small"
        else MUSt3RConfig(**overrides)
    )
    return MUSt3RWrapper(cfg)


@register_model("mast3r_sga")
def _build_mast3r_sga(size: str = "full", **kwargs):
    """Native MASt3R + sparse global alignment (reference external/mast3r/)."""
    from mapanything_tpu.models.external.mast3r import (
        MASt3RConfig,
        MASt3RSGAWrapper,
    )

    cfg_kw = {k: v for k, v in kwargs.items()
              if k in MASt3RConfig.__dataclass_fields__}
    wrap_kw = {k: v for k, v in kwargs.items() if k not in cfg_kw}
    cfg = (
        MASt3RConfig.small(**cfg_kw) if size == "small"
        else MASt3RConfig(**cfg_kw)
    )
    return MASt3RSGAWrapper(cfg, **wrap_kw)


def init_model(model_str: str, **model_config):
    """Build a model by registry name (reference models/__init__.py:41)."""
    if model_str not in MODEL_REGISTRY:
        raise KeyError(
            f"unknown model '{model_str}'; available: {sorted(MODEL_REGISTRY)}"
        )
    return MODEL_REGISTRY[model_str](**model_config)


@register_model("moge_2")
def _build_moge2(size: str = "full", **overrides):
    """Native MoGe-2 baseline (reference external/moge/models/v2.py:28):
    ConvStack neck/heads + normals + metric scale head."""
    from mapanything_tpu.models.external.moge import MoGe2Config, MoGe2Wrapper

    cfg = (
        MoGe2Config.small(**overrides) if size == "small" else MoGe2Config(**overrides)
    )
    return MoGe2Wrapper(cfg)


@register_model("metric_dust3r")
def _build_metric_dust3r(size: str = "full", **kwargs):
    """Metric DUSt3R (reference model zoo "metric_dust3r",
    models/__init__.py:62-110): the same pairwise DUSt3R trunk + global
    aligner; the metric variant differs upstream only in checkpoint and
    the exp (unbounded) depth adaptor, which ModularDUSt3RConfig's default
    pointmap RangeConfig("exp") already is."""
    return _build_dust3r_ba(size=size, **kwargs)


@register_model("vggsfm_tracker")
def _build_vggsfm_tracker(**overrides):
    """Learned VGGSfM coarse->fine track predictor — native flax
    re-implementation of the reference's tracker network
    (mapanything/third_party/vggsfm_tracker.py:18). Weights convert from
    the reference checkpoint via utils.torch_convert.convert_vggsfm_tracker;
    the weights-free classical tracker (ba/tracker.py) is the fallback
    route in ba.tracker.predict_tracks."""
    from mapanything_tpu.models.external.vggsfm_tracker import VGGSfMTracker

    return VGGSfMTracker(**overrides)
