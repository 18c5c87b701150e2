"""Output adaptors: map raw head channels to geometric quantities.

Capability parity with the ~35 adaptor classes of
``uniception/models/prediction_heads/adaptors.py:26-2139``. Adaptors are
stateless activations, so here they are pure functions plus one generic
``DenseAdaptor`` spec that composes per-component activations with optional
confidence and mask channels — covering every
``<components>[+confidence][+mask]`` combination of the reference with a
single code path.

All functions are channel-last (..., C) and dtype-preserving; run them in
fp32 (the reference forces heads/adaptors to fp32, model.py:1774).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Optional, Sequence, Tuple

import flax.struct
import jax.numpy as jnp

from mapanything_tpu.geometry.normalization import safe_norm

INF = float("inf")


def _clip(x, vmin, vmax):
    if vmin == -INF and vmax == INF:
        return x
    return jnp.clip(x, vmin, vmax)


@dataclass(frozen=True)
class RangeConfig:
    mode: str = "linear"  # linear | square | exp | z_exp
    vmin: float = -INF
    vmax: float = INF


def adapt_scale(x, cfg: RangeConfig):
    """ScaleAdaptor (reference :171): linear/square/exp then clip."""
    if cfg.mode == "linear":
        out = x
    elif cfg.mode == "square":
        out = jnp.square(x)
    elif cfg.mode == "exp":
        out = jnp.exp(x)
    else:
        raise ValueError(cfg.mode)
    return _clip(out, cfg.vmin, cfg.vmax)


def adapt_depth(x, cfg: RangeConfig):
    """DepthAdaptor (reference :237): linear/square/exp then clip."""
    return adapt_scale(x, cfg)


def adapt_pointmap(x, cfg: RangeConfig):
    """PointMapAdaptor (reference :283): distance-space scaling of (..., 3)."""
    if cfg.mode == "linear":
        out = x
    elif cfg.mode in ("square", "exp"):
        d = safe_norm(x, axis=-1, keepdims=True)
        unit = x / jnp.maximum(d, 1e-8)
        out = unit * (jnp.square(d) if cfg.mode == "square" else jnp.expm1(d))
    elif cfg.mode == "z_exp":
        xy, z = x[..., :2], x[..., 2:3]
        z = jnp.exp(z)
        out = jnp.concatenate([xy * z, z], axis=-1)
    else:
        raise ValueError(cfg.mode)
    return _clip(out, cfg.vmin, cfg.vmax)


def adapt_cam_translation(x, cfg: RangeConfig):
    """CamTranslationAdaptor / RayOriginsAdaptor (reference :586, :342)."""
    if cfg.mode == "linear":
        out = x
    elif cfg.mode in ("square", "exp"):
        d = safe_norm(x, axis=-1, keepdims=True)
        unit = x / jnp.maximum(d, 1e-8)
        out = unit * (jnp.square(d) if cfg.mode == "square" else jnp.expm1(d))
    else:
        raise ValueError(cfg.mode)
    return _clip(out, cfg.vmin, cfg.vmax)


@dataclass(frozen=True)
class RayDirsConfig:
    mode: str = "linear"
    normalize_to_unit_sphere: bool = True
    normalize_to_unit_image_plane: bool = False
    vmin: float = -INF
    vmax: float = INF
    clamp_min_of_z_dir: bool = False
    z_dir_min: float = 1.0


def adapt_ray_directions(x, cfg: RayDirsConfig):
    """RayDirectionsAdaptor (reference :393)."""
    assert cfg.mode == "linear"
    out = _clip(x, cfg.vmin, cfg.vmax)
    if cfg.clamp_min_of_z_dir:
        out = jnp.concatenate(
            [out[..., :2], jnp.maximum(out[..., 2:3], cfg.z_dir_min)], axis=-1
        )
    if cfg.normalize_to_unit_sphere:
        norm = jnp.maximum(safe_norm(out, axis=-1, keepdims=True), 1e-8)
        out = out / norm
    elif cfg.normalize_to_unit_image_plane:
        out = out / out[..., 2:3]
    return out


@dataclass(frozen=True)
class QuatsConfig:
    mode: str = "linear"
    normalize: bool = True
    vmin: float = -INF
    vmax: float = INF


def adapt_quaternions(x, cfg: QuatsConfig):
    """QuaternionsAdaptor (reference :637): clip then unit-normalize."""
    assert cfg.mode == "linear"
    out = _clip(x, cfg.vmin, cfg.vmax)
    if cfg.normalize:
        out = out / jnp.maximum(safe_norm(out, axis=-1, keepdims=True), 1e-8)
    return out


@dataclass(frozen=True)
class ConfidenceConfig:
    confidence_type: str = "exp"
    vmin: float = 1.0
    vmax: float = INF


def adapt_confidence(x, cfg: ConfidenceConfig):
    """ConfidenceAdaptor (reference :1012).

    exp: vmin + exp(x) clipped to vmax - vmin ("expp1" family);
    sigmoid: vmin + sigmoid(x) * (vmax - vmin).
    """
    if cfg.confidence_type == "exp":
        e = jnp.exp(x)
        if math.isfinite(cfg.vmax):
            e = jnp.minimum(e, cfg.vmax - cfg.vmin)
        return cfg.vmin + e
    if cfg.confidence_type == "sigmoid":
        return jnp.reciprocal(1 + jnp.exp(-x)) * (cfg.vmax - cfg.vmin) + cfg.vmin
    raise ValueError(cfg.confidence_type)


def adapt_rgb(x):
    """RGBAdaptor (reference :216, fork): (tanh(x) + 1) / 2."""
    return (jnp.tanh(x) + 1.0) * 0.5


def adapt_mask(x):
    """MaskAdaptor (reference :1114): returns (sigmoid probs, raw logits)."""
    return jnp.reciprocal(1 + jnp.exp(-x)), x


@flax.struct.dataclass
class DenseAdaptorOutput:
    """Adapted dense channels (all channel-last, fp32)."""

    value: jnp.ndarray  # (..., sum of component channels)
    confidence: Optional[jnp.ndarray] = None  # (..., 1)
    mask: Optional[jnp.ndarray] = None  # (..., 1) sigmoid probs
    logits: Optional[jnp.ndarray] = None  # (..., 1) raw mask logits


@dataclass(frozen=True)
class DenseAdaptorConfig:
    """Generic spec covering the reference's combined dense adaptors.

    ``components`` is an ordered tuple drawn from:
      pointmap(3), ray_origins(3), ray_directions(3), depth(1), rgb(3),
      cam_translation(3), quaternions(4)
    with confidence/mask channels appended when enabled — exactly the
    channel layout the reference's combined adaptors expect.
    """

    components: Tuple[str, ...] = ("ray_directions", "depth")
    with_confidence: bool = True
    with_mask: bool = True
    ray_dirs: RayDirsConfig = field(default_factory=RayDirsConfig)
    depth: RangeConfig = field(default_factory=lambda: RangeConfig("exp", 0.0, INF))
    pointmap: RangeConfig = field(default_factory=lambda: RangeConfig("linear"))
    cam_translation: RangeConfig = field(default_factory=lambda: RangeConfig("linear"))
    quaternions: QuatsConfig = field(default_factory=QuatsConfig)
    confidence: ConfidenceConfig = field(default_factory=ConfidenceConfig)

    _CHANNELS = {
        "pointmap": 3,
        "ray_origins": 3,
        "ray_directions": 3,
        "depth": 1,
        "rgb": 3,
        "cam_translation": 3,
        "quaternions": 4,
    }

    @property
    def num_value_channels(self) -> int:
        return sum(self._CHANNELS[c] for c in self.components)

    @property
    def num_channels(self) -> int:
        return (
            self.num_value_channels
            + (1 if self.with_confidence else 0)
            + (1 if self.with_mask else 0)
        )

    def component_slices(self):
        out, start = {}, 0
        for c in self.components:
            n = self._CHANNELS[c]
            out[c] = (start, start + n)
            start += n
        return out


def apply_dense_adaptor(x: jnp.ndarray, cfg: DenseAdaptorConfig) -> DenseAdaptorOutput:
    """Apply the configured per-component activations to raw channels.

    Parity: the reference's ``<X>With[Confidence][And][Mask]Adaptor``
    family (adaptors.py:1134-2139) — value channels first, then confidence,
    then mask.
    """
    assert x.shape[-1] == cfg.num_channels, (
        f"expected {cfg.num_channels} channels, got {x.shape[-1]}"
    )
    values = []
    start = 0
    for comp in cfg.components:
        n = cfg._CHANNELS[comp]
        xi = x[..., start : start + n]
        start += n
        if comp == "pointmap":
            values.append(adapt_pointmap(xi, cfg.pointmap))
        elif comp in ("ray_origins", "cam_translation"):
            values.append(adapt_cam_translation(xi, cfg.cam_translation))
        elif comp == "ray_directions":
            values.append(adapt_ray_directions(xi, cfg.ray_dirs))
        elif comp == "depth":
            values.append(adapt_depth(xi, cfg.depth))
        elif comp == "rgb":
            values.append(adapt_rgb(xi))
        elif comp == "quaternions":
            values.append(adapt_quaternions(xi, cfg.quaternions))
        else:
            raise ValueError(comp)
    value = jnp.concatenate(values, axis=-1)

    confidence = mask = logits = None
    if cfg.with_confidence:
        confidence = adapt_confidence(x[..., start : start + 1], cfg.confidence)
        start += 1
    if cfg.with_mask:
        mask, logits = adapt_mask(x[..., start : start + 1])
        start += 1
    return DenseAdaptorOutput(value=value, confidence=confidence, mask=mask, logits=logits)


@dataclass(frozen=True)
class PoseAdaptorConfig:
    """CamTranslationPlusQuatsAdaptor (reference :688)."""

    cam_translation: RangeConfig = field(default_factory=lambda: RangeConfig("linear"))
    quaternions: QuatsConfig = field(default_factory=QuatsConfig)


def apply_pose_adaptor(x: jnp.ndarray, cfg: PoseAdaptorConfig) -> jnp.ndarray:
    """(..., 7) raw [trans, quats] -> adapted [trans, unit quats]."""
    trans = adapt_cam_translation(x[..., :3], cfg.cam_translation)
    quats = adapt_quaternions(x[..., 3:7], cfg.quaternions)
    return jnp.concatenate([trans, quats], axis=-1)


@dataclass(frozen=True)
class ScaleAdaptorConfig:
    mode: str = "exp"
    vmin: float = 1e-8
    vmax: float = INF


def apply_scale_adaptor(x: jnp.ndarray, cfg: ScaleAdaptorConfig) -> jnp.ndarray:
    return adapt_scale(x, RangeConfig(cfg.mode, cfg.vmin, cfg.vmax))


_COMPONENTS_BY_SCENE_REP = {
    "pointmap": ("pointmap",),
    "raymap+depth": ("ray_origins", "ray_directions", "depth"),
    "raydirs+depth": ("ray_directions", "depth"),
    "raydirs+depth+pose": ("ray_directions", "depth"),
    "raydirs+depth+rgb+pose": ("ray_directions", "depth", "rgb"),
    "campointmap+pose": ("pointmap",),
    "pointmap+raydirs+depth+pose": ("pointmap", "ray_directions", "depth"),
}


def dense_components_for_scene_rep(scene_rep_type: str) -> Tuple[str, ...]:
    """Map a scene-rep family name to its dense channel components."""
    return _COMPONENTS_BY_SCENE_REP[scene_rep_type]
