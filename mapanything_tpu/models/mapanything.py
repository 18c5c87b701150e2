"""MapAnything-TPU: the flagship N-view metric 3D reconstruction model.

Capability parity with the reference ``mapanything/models/mapanything/model.py``
(class MapAnything, :96,1292,1657,2207): multi-modal encoding (images + ray
directions + depth + camera poses + metric-scale flags), additive fusion with
a LayerNorm, a scale token, multi-view alternating-attention information
sharing, DPT + pose + scale heads, and factored scene-representation
assembly.

TPU-first redesign (SURVEY.md section 7):
  - Views are a single batched pytree of (B, V, ...) arrays with boolean
    per-(batch, view) modality masks — no Python list-of-dicts, no
    data-dependent control flow; "modality dropout" is multiply-by-mask
    (the reference already zero-masks, model.py:742-745,961-968).
  - Train-time modality-mask sampling (reference model.py:1292-1372) is a
    separate pure function ``sample_modality_masks(rng, ...)`` so the model
    forward stays deterministic given its inputs.
  - Channel-last everywhere; image encoder + trunk run in a configurable
    compute dtype (bf16 on TPU), geometric encoders / heads / adaptors in
    fp32 (mirroring the reference's autocast boundaries, model.py:1377,1774).
  - The dense head can be chunked over views (``head_chunk_size``) — the
    static-shape analogue of the reference's memory-efficient inference
    (model.py:1440-1618).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp

from mapanything_tpu.geometry.camera import pointmap_from_rays_depth_pose
from mapanything_tpu.geometry.normalization import (
    apply_log_to_norm,
    normalize_depth_using_non_zero_pixels,
    normalize_pose_translations,
    safe_norm,
)
from mapanything_tpu.geometry.quaternion import relative_pose_quats_trans
from mapanything_tpu.models.encoders.dense_rep import (
    DenseRepresentationEncoder,
    GlobalRepresentationEncoder,
)
from mapanything_tpu.models.encoders.vit import ViTEncoder
from mapanything_tpu.models.heads.adaptors import (
    DenseAdaptorConfig,
    PoseAdaptorConfig,
    ScaleAdaptorConfig,
    apply_dense_adaptor,
    apply_pose_adaptor,
    apply_scale_adaptor,
    dense_components_for_scene_rep,
)
from mapanything_tpu.models.heads.dpt import DPTFeature, DPTRegressionProcessor
from mapanything_tpu.models.heads.pose import MLPHead, PoseHead
from mapanything_tpu.models.info_sharing.alternating import (
    AlternatingAttentionTransformer,
)

# --------------------------------------------------------------------------
# Input / output pytrees
# --------------------------------------------------------------------------


@flax.struct.dataclass
class Views:
    """Batched multi-view input: (B, V, ...) arrays, optional modalities.

    The reference's list-of-view-dicts (model.py:1657 docstring) becomes one
    static pytree. Optional entries are None (static structure under jit).
    Camera poses are OpenCV-RDF cam2world with XYZW quaternions, any world
    frame (the model canonicalizes to view 0).
    """

    img: jnp.ndarray  # (B, V, H, W, 3) normalized images
    ray_directions: Optional[jnp.ndarray] = None  # (B, V, H, W, 3) unit-sphere, cam frame
    depth_along_ray: Optional[jnp.ndarray] = None  # (B, V, H, W, 1)
    camera_pose_quats: Optional[jnp.ndarray] = None  # (B, V, 4) XYZW
    camera_pose_trans: Optional[jnp.ndarray] = None  # (B, V, 3)
    is_metric_scale: Optional[jnp.ndarray] = None  # (B, V) bool

    @property
    def batch_size(self) -> int:
        return self.img.shape[0]

    @property
    def num_views(self) -> int:
        return self.img.shape[1]

    @property
    def image_hw(self) -> Tuple[int, int]:
        return self.img.shape[2], self.img.shape[3]


@flax.struct.dataclass
class ModalityMasks:
    """Per-(batch, view) input-modality decisions, all (B, V) bool.

    Produced by ``sample_modality_masks`` at train time (parity with the
    Bernoulli scheme of model.py:1292-1372) or set deterministically at
    inference from the task config (model.py:2154-2197).
    """

    rgb: jnp.ndarray
    ray_dirs: jnp.ndarray
    depth: jnp.ndarray
    cam: jnp.ndarray
    # metric-scale conditioning kill-switches (True = hide metric scale):
    depth_scale_norm_all: jnp.ndarray  # (B, V) bool
    pose_scale_norm_all: jnp.ndarray  # (B, V) bool
    # optional per-pixel depth sparsification keep-mask (B, V, H, W, 1)
    depth_sparsification_keep: Optional[jnp.ndarray] = None


def full_modality_masks(
    batch: int,
    num_views: int,
    use_ray_dirs: bool = False,
    use_depth: bool = False,
    use_cam: bool = False,
) -> ModalityMasks:
    """Deterministic masks for inference (all-or-nothing per modality)."""
    ones = jnp.ones((batch, num_views), bool)
    zeros = jnp.zeros((batch, num_views), bool)
    return ModalityMasks(
        rgb=ones,
        ray_dirs=ones if use_ray_dirs else zeros,
        depth=ones if use_depth else zeros,
        cam=ones if use_cam else zeros,
        depth_scale_norm_all=zeros,
        pose_scale_norm_all=zeros,
    )


@dataclass(frozen=True)
class GeometricInputConfig:
    """Modality-dropout probabilities (configs/model/task/*.yaml parity)."""

    overall_prob: float = 0.9
    dropout_prob: float = 0.05
    ray_dirs_prob: float = 0.5
    depth_prob: float = 0.5
    cam_prob: float = 0.5
    sparse_depth_prob: float = 0.5
    sparsification_removal_percent: float = 0.9
    depth_scale_norm_all_prob: float = 0.05
    pose_scale_norm_all_prob: float = 0.05
    rgb_dropout_prob: float = 0.0  # [FORK] masked-view completion


def sample_modality_masks(
    rng: jax.Array,
    batch: int,
    num_views: int,
    image_hw: Tuple[int, int],
    cfg: GeometricInputConfig,
) -> ModalityMasks:
    """Sample per-sample Bernoulli modality masks (reference model.py:1292-1372).

    Matches the reference's sampling granularity: overall / ray / depth / cam
    probabilities are drawn per batch element and shared across views; the
    dropout probability is drawn per (batch, view). Views without RGB are
    forced to receive rays + camera (the fork's no-image constraint).

    Sparse depth: the reference removes an exact fraction of valid pixels via
    randperm (model.py:1090-1110); we use an iid Bernoulli keep-mask with the
    same expected density — statistically equivalent and static-shape.
    """
    ks = jax.random.split(rng, 8)
    u = lambda k, shape: jax.random.uniform(k, shape)

    overall = u(ks[0], (batch, 1)) < cfg.overall_prob  # (B, 1) -> broadcast V
    keep = u(ks[1], (batch, num_views)) < (1.0 - cfg.dropout_prob)
    geo = overall & keep

    ray = (u(ks[2], (batch, 1)) < cfg.ray_dirs_prob) & geo
    depth = (u(ks[3], (batch, 1)) < cfg.depth_prob) & geo
    cam = (u(ks[4], (batch, 1)) < cfg.cam_prob) & geo

    if cfg.rgb_dropout_prob > 0:
        rgb = u(ks[5], (batch, num_views)) > cfg.rgb_dropout_prob
        rgb = rgb.at[:, 0].set(True)  # reference view always has RGB
    else:
        rgb = jnp.ones((batch, num_views), bool)
    ray = ray | ~rgb
    cam = cam | ~rgb

    depth_scale_norm_all = u(ks[6], (batch, num_views)) < cfg.depth_scale_norm_all_prob
    pose_scale_norm_all = u(ks[6], (batch, num_views)) < cfg.pose_scale_norm_all_prob

    sparsify_keep = None
    if cfg.sparse_depth_prob > 0:
        k_sel, k_mask = jax.random.split(ks[7])
        use_sparse = jax.random.uniform(k_sel, ()) < cfg.sparse_depth_prob
        h, w = image_hw
        keep_pix = (
            jax.random.uniform(k_mask, (batch, num_views, h, w, 1))
            > cfg.sparsification_removal_percent
        )
        sparsify_keep = jnp.where(use_sparse, keep_pix, jnp.ones_like(keep_pix))

    return ModalityMasks(
        rgb=rgb,
        ray_dirs=ray,
        depth=depth,
        cam=cam,
        depth_scale_norm_all=depth_scale_norm_all,
        pose_scale_norm_all=pose_scale_norm_all,
        depth_sparsification_keep=sparsify_keep,
    )


@flax.struct.dataclass
class Predictions:
    """Model outputs for all views, metric-scaled (reference forward tail).

    Shapes: dense maps (B, V, H, W, C); poses (B, V, 3|4); scale (B,).
    """

    pts3d: jnp.ndarray  # world frame, metric
    pts3d_cam: Optional[jnp.ndarray] = None
    ray_directions: Optional[jnp.ndarray] = None  # unit, cam frame
    depth_along_ray: Optional[jnp.ndarray] = None  # metric
    cam_trans: Optional[jnp.ndarray] = None  # metric, view-0 frame
    cam_quats: Optional[jnp.ndarray] = None
    metric_scaling_factor: Optional[jnp.ndarray] = None  # (B,)
    conf: Optional[jnp.ndarray] = None  # (B, V, H, W)
    non_ambiguous_mask: Optional[jnp.ndarray] = None  # (B, V, H, W) bool
    non_ambiguous_mask_logits: Optional[jnp.ndarray] = None
    rgb: Optional[jnp.ndarray] = None  # [FORK] predicted RGB
    ray_origins: Optional[jnp.ndarray] = None  # raymap family only


# --------------------------------------------------------------------------
# Model configuration
# --------------------------------------------------------------------------


@dataclass(frozen=True)
class MapAnythingConfig:
    """Static architecture config (mirrors configs/model/mapanything.yaml)."""

    # encoder
    encoder_size: str = "large"
    patch_size: int = 14
    # info sharing (aat_ifr_24_layers.yaml)
    info_sharing_depth: int = 24
    info_sharing_dim: int = 768
    info_sharing_num_heads: int = 12
    info_sharing_indices: Tuple[int, ...] = (11, 17)
    distinguish_ref_and_non_ref_views: bool = True
    use_pe_for_non_reference_views: bool = False
    max_num_views_for_pe: int = 1000
    use_rand_idx_pe_for_non_reference_views: bool = True
    use_scalable_softmax: bool = False
    use_entropy_scaling: bool = False
    # heads (dpt_pose_scale.yaml); dense_head_type covers the reference's
    # pred_head families: dpt(+pose), moge(+pose) [FORK], mae(+pose) [FORK],
    # linear (model.py:389-421)
    dense_head_type: str = "dpt"
    dpt_feature_dim: int = 256
    dpt_layer_dims: Tuple[int, ...] = (96, 192, 384, 768)
    dpt_hooks: Tuple[int, ...] = (0, 1, 2, 3)
    pose_head_num_resconv: int = 2
    scene_rep_type: str = "raydirs+depth+pose"
    with_confidence: bool = True
    with_mask: bool = True
    use_factored_predictions_for_global_pointmaps: bool = True
    # Feature-returner encoder preset (dinov2_large_feature_returner,
    # reference model.py:166-172,1725-1737): the RAW image-encoder output
    # is prepended to the dense-head feature list (5 levels). Only the
    # list-consuming heads (mae/moge) accept it, as upstream.
    use_raw_encoder_features_for_dpt: bool = False
    # adaptors (raydirs_depth_pose_confidence_mask_scale.yaml)
    dense_adaptor: DenseAdaptorConfig = field(
        default_factory=lambda: DenseAdaptorConfig(
            components=("ray_directions", "depth"),
            with_confidence=True,
            with_mask=True,
        )
    )
    pose_adaptor: PoseAdaptorConfig = field(default_factory=PoseAdaptorConfig)
    scale_adaptor: ScaleAdaptorConfig = field(default_factory=ScaleAdaptorConfig)
    # execution
    # Route the trunk's global layers through the explicit context-parallel
    # schedules (ring / allgather-KV) when a parallel.cp context is active.
    context_parallel_trunk: bool = False
    # nn.scan the encoder's blocks and the trunk's layer pairs instead of
    # unrolling them: identical numerics, ~an order of magnitude smaller
    # HLO (the compile-time cut that fits the driver's virtual-CPU flagship
    # dryrun in its clock). Parameter layout differs (stacked leading layer
    # dim) — models.scan_repack converts both ways; parity tests and torch
    # converters target the default unrolled layout.
    scan_layers: bool = False
    compute_dtype: str = "float32"  # bf16 on TPU
    # Dense/pose/scale head compute dtype. "float32" matches the reference
    # (model.py:1774 forces autocast off for the heads); "bfloat16" runs the
    # DPT convs on the MXU natively (adaptors/outputs stay fp32).
    head_dtype: str = "float32"
    # DPT fusion-pyramid dtype (the reassemble/fusion convs of DPTFeature,
    # NOT the final regression decode). None -> follow compute_dtype: the
    # fusion consumes trunk features already carrying compute-dtype
    # precision, so storing its activations wider buys nothing — on TPU
    # this halves the head's HBM traffic (fp32 matmuls run as single-pass
    # bf16 on the MXU either way at default XLA precision). The regression
    # processor, pose/scale heads, and all adaptors stay at head_dtype.
    dpt_fusion_dtype: Optional[str] = None
    remat: bool = False
    # Per-part override: None follows ``remat``. The trunk's activations
    # are small (V*P x 768) next to the encoder's (V*P x 1024 x 24 layers),
    # so trunk_remat=False + encoder remat is the memory/speed sweet spot.
    encoder_remat: Optional[bool] = None
    trunk_remat: Optional[bool] = None
    # jax.checkpoint policy for the rematerialized blocks: None = full
    # recompute; "dots" = save matmul outputs, recompute elementwise
    # (jax.checkpoint_policies.dots_with_no_batch_dims_saveable) — trades
    # a little memory for far less recompute in the backward.
    remat_policy: Optional[str] = None
    # Per-part policy override: None follows ``remat_policy``. The encoder
    # cost is linear in V while the trunk's global attention is quadratic,
    # so a richer save policy on the encoder (whose replay the backward
    # would otherwise pay in full) with full recompute on the trunk is the
    # throughput sweet spot at training shapes.
    encoder_remat_policy: Optional[str] = None
    trunk_remat_policy: Optional[str] = None
    head_chunk_size: Optional[int] = None  # chunk B*V for the dense head

    def with_updates(self, **kw):
        from dataclasses import replace

        return replace(self, **kw)

    @property
    def dense_components(self) -> Tuple[str, ...]:
        return dense_components_for_scene_rep(self.scene_rep_type)


def _small_config(**kw) -> MapAnythingConfig:
    """A small config for tests / CPU smoke runs."""
    base = dict(
        encoder_size="small",
        patch_size=14,
        info_sharing_depth=4,
        info_sharing_dim=256,
        info_sharing_num_heads=4,
        info_sharing_indices=(1, 2),
        dpt_feature_dim=64,
        dpt_layer_dims=(32, 48, 64, 96),
    )
    base.update(kw)
    return MapAnythingConfig(**base)


MapAnythingConfig.small = staticmethod(_small_config)


# --------------------------------------------------------------------------
# The model
# --------------------------------------------------------------------------


class MapAnything(nn.Module):
    """N-view multi-modal encoder -> fuse -> info-share -> heads -> scene rep."""

    config: MapAnythingConfig

    @nn.compact
    def __call__(
        self,
        views: Views,
        masks: Optional[ModalityMasks] = None,
        deterministic: bool = True,
        non_ref_view_pe_indices: Optional[jnp.ndarray] = None,
    ) -> Predictions:
        cfg = self.config
        dtype = jnp.dtype(cfg.compute_dtype)
        B, V, H, W, _ = views.img.shape
        h, w = H // cfg.patch_size, W // cfg.patch_size

        if masks is None:
            masks = full_modality_masks(
                B,
                V,
                use_ray_dirs=views.ray_directions is not None,
                use_depth=views.depth_along_ray is not None,
                use_cam=views.camera_pose_quats is not None,
            )

        # ------------------------------------------------------------------
        # 1. Image encoding (reference _encode_n_views, model.py:670)
        # ------------------------------------------------------------------
        rgb_mask = masks.rgb
        imgs = views.img * rgb_mask[..., None, None, None]
        encoder = ViTEncoder(
            size=cfg.encoder_size,
            patch_size=cfg.patch_size,
            dtype=dtype,
            remat=cfg.remat if cfg.encoder_remat is None else cfg.encoder_remat,
            remat_policy=(
                cfg.remat_policy
                if cfg.encoder_remat_policy is None
                else cfg.encoder_remat_policy
            ),
            scan_blocks=cfg.scan_layers,
            name="encoder",
        )
        enc_feats = encoder(imgs.reshape(B * V, H, W, 3), deterministic)
        embed_dim = encoder.embed_dim
        enc_feats = enc_feats.reshape(B, V, h, w, embed_dim)
        enc_feats = enc_feats * rgb_mask[..., None, None, None]

        # Geometric encoding runs fp32 (reference model.py:1377 autocast off).
        feats = enc_feats.astype(jnp.float32)

        # ------------------------------------------------------------------
        # 2. Pose canonicalization to view 0 (model.py:792)
        # ------------------------------------------------------------------
        cam_mask = masks.cam
        identity_quat = jnp.broadcast_to(
            jnp.asarray([0.0, 0.0, 0.0, 1.0], jnp.float32), (B, V, 4)
        )
        zero_trans = jnp.zeros((B, V, 3), jnp.float32)
        if views.camera_pose_quats is not None:
            q_all = views.camera_pose_quats.astype(jnp.float32)
            t_all = views.camera_pose_trans.astype(jnp.float32)
            q_ref = jnp.broadcast_to(q_all[:, :1], q_all.shape)
            t_ref = jnp.broadcast_to(t_all[:, :1], t_all.shape)
            q_rel, t_rel = relative_pose_quats_trans(q_ref, t_ref, q_all, t_all)
            pose_quats = jnp.where(cam_mask[..., None], q_rel, identity_quat)
            pose_trans = jnp.where(cam_mask[..., None], t_rel, zero_trans)
        else:
            cam_mask = jnp.zeros_like(cam_mask)
            pose_quats, pose_trans = identity_quat, zero_trans

        # ------------------------------------------------------------------
        # 3. Ray directions (model.py:898)
        # ------------------------------------------------------------------
        ray_mask = masks.ray_dirs
        if views.ray_directions is not None:
            rays = views.ray_directions.astype(jnp.float32) * ray_mask[..., None, None, None]
            ray_feats = DenseRepresentationEncoder(
                in_chans=3,
                enc_embed_dim=embed_dim,
                patch_size=cfg.patch_size,
                apply_pe=False,  # configs/model/task/default.yaml
                name="ray_dirs_encoder",
            )(rays.reshape(B * V, H, W, 3))
            ray_feats = ray_feats.reshape(B, V, h, w, embed_dim)
            feats = feats + ray_feats * ray_mask[..., None, None, None]
        else:
            ray_mask = jnp.zeros_like(ray_mask)

        # ------------------------------------------------------------------
        # 4. Depth (model.py:973): per-view norm + log, + scale token add
        # ------------------------------------------------------------------
        depth_mask = masks.depth
        if views.depth_along_ray is not None:
            depth = views.depth_along_ray.astype(jnp.float32)
            depth = depth * depth_mask[..., None, None, None]
            if masks.depth_sparsification_keep is not None:
                depth = depth * masks.depth_sparsification_keep
            depth_flat = depth.reshape(B * V, H, W, 1)
            depth_norm, depth_factor = normalize_depth_using_non_zero_pixels(
                depth_flat, return_norm_factor=True
            )
            depth_log = apply_log_to_norm(depth_norm)
            depth_feats = DenseRepresentationEncoder(
                in_chans=1,
                enc_embed_dim=embed_dim,
                patch_size=cfg.patch_size,
                apply_pe=False,  # configs/model/task/default.yaml
                name="depth_encoder",
            )(depth_log)
            depth_feats = depth_feats.reshape(B, V, h, w, embed_dim)
            feats = feats + depth_feats * depth_mask[..., None, None, None]

            # Metric-scale token (only for metric samples, model.py:1120-1165)
            is_metric = (
                views.is_metric_scale
                if views.is_metric_scale is not None
                else jnp.zeros((B, V), bool)
            )
            metric_depth_mask = is_metric & ~masks.depth_scale_norm_all & depth_mask
            log_factor = jnp.log(depth_factor + 1e-8).reshape(B * V, 1)
            depth_scale_feats = GlobalRepresentationEncoder(
                in_chans=1, enc_embed_dim=embed_dim, name="depth_scale_encoder"
            )(log_factor).reshape(B, V, embed_dim)
            depth_scale_feats = (
                depth_scale_feats
                * depth_mask[..., None]
                * metric_depth_mask[..., None]
            )
            feats = feats + depth_scale_feats[:, :, None, None, :]
        else:
            depth_mask = jnp.zeros_like(depth_mask)

        # ------------------------------------------------------------------
        # 5. Camera quats/trans (+ pose scale token) (model.py:1170)
        # ------------------------------------------------------------------
        if views.camera_pose_quats is not None:
            quat_feats = GlobalRepresentationEncoder(
                in_chans=4, enc_embed_dim=embed_dim, name="cam_rot_encoder"
            )(pose_quats.reshape(B * V, 4)).reshape(B, V, embed_dim)
            quat_feats = quat_feats * cam_mask[..., None]

            trans_scaled, trans_factor = normalize_pose_translations(
                pose_trans, return_norm_factor=True
            )  # (B, V, 3), (B,)
            trans_feats = GlobalRepresentationEncoder(
                in_chans=3, enc_embed_dim=embed_dim, name="cam_trans_encoder"
            )(trans_scaled.reshape(B * V, 3)).reshape(B, V, embed_dim)
            trans_feats = trans_feats * cam_mask[..., None]

            is_metric = (
                views.is_metric_scale
                if views.is_metric_scale is not None
                else jnp.zeros((B, V), bool)
            )
            metric_pose_mask = is_metric & ~masks.pose_scale_norm_all
            log_tf = jnp.log(trans_factor + 1e-8)[:, None, None]  # (B, 1, 1)
            log_tf = jnp.broadcast_to(log_tf, (B, V, 1)).reshape(B * V, 1)
            trans_scale_feats = GlobalRepresentationEncoder(
                in_chans=1, enc_embed_dim=embed_dim, name="cam_trans_scale_encoder"
            )(log_tf).reshape(B, V, embed_dim)
            trans_scale_feats = (
                trans_scale_feats * cam_mask[..., None] * metric_pose_mask[..., None]
            )

            feats = feats + (quat_feats + trans_feats + trans_scale_feats)[:, :, None, None, :]

        # ------------------------------------------------------------------
        # 6. Fusion norm (model.py:1422) + scale token
        # ------------------------------------------------------------------
        feats = nn.LayerNorm(epsilon=1e-6, name="fusion_norm")(feats)

        scale_token = self.param(
            "scale_token", nn.initializers.truncated_normal(0.02), (embed_dim,)
        )
        scale_tokens = jnp.broadcast_to(scale_token, (B, 1, embed_dim))

        # ------------------------------------------------------------------
        # 7. Info sharing (model.py:1702; alternating_attention_transformer)
        # ------------------------------------------------------------------
        trunk = AlternatingAttentionTransformer(
            input_embed_dim=embed_dim,
            depth=cfg.info_sharing_depth,
            dim=cfg.info_sharing_dim,
            num_heads=cfg.info_sharing_num_heads,
            indices=cfg.info_sharing_indices,
            distinguish_ref_and_non_ref_views=cfg.distinguish_ref_and_non_ref_views,
            use_pe_for_non_reference_views=cfg.use_pe_for_non_reference_views,
            max_num_views_for_pe=cfg.max_num_views_for_pe,
            use_rand_idx_pe_for_non_reference_views=cfg.use_rand_idx_pe_for_non_reference_views,
            use_scalable_softmax=cfg.use_scalable_softmax,
            use_entropy_scaling=cfg.use_entropy_scaling,
            context_parallel=cfg.context_parallel_trunk,
            dtype=dtype,
            remat=cfg.remat if cfg.trunk_remat is None else cfg.trunk_remat,
            remat_policy=(
                cfg.remat_policy
                if cfg.trunk_remat_policy is None
                else cfg.trunk_remat_policy
            ),
            scan_pairs=cfg.scan_layers,
            name="info_sharing",
        )
        final_feats, intermediates, token_feats = trunk(
            feats.astype(dtype), scale_tokens, non_ref_view_pe_indices, deterministic
        )

        # ------------------------------------------------------------------
        # 8. Heads in fp32 (model.py:1774 autocast off; :1518 downstream_head)
        # ------------------------------------------------------------------
        hdt = jnp.dtype(cfg.head_dtype)
        fdt = jnp.dtype(cfg.dpt_fusion_dtype or cfg.compute_dtype)
        # Hook 0 consumes the FUSED post-fusion-norm features (the trunk
        # input), matching the reference's ``all_encoder_features_across_views``
        # (model.py:1730-1737) — not the raw image-encoder output.
        dense_inputs = [
            feats.astype(fdt),
            intermediates[0].astype(fdt),
            intermediates[1].astype(fdt),
            final_feats.astype(fdt),
        ]
        if cfg.use_raw_encoder_features_for_dpt:
            assert cfg.dense_head_type in ("mae", "moge"), (
                "raw encoder features need a list-consuming head "
                "(reference model.py:364-372)"
            )
            dense_inputs = [enc_feats.astype(fdt)] + dense_inputs
        dense_inputs = [x.reshape(B * V, h, w, x.shape[-1]) for x in dense_inputs]

        pose_head = PoseHead(
            patch_size=cfg.patch_size,
            num_resconv_block=cfg.pose_head_num_resconv,
            dtype=hdt,
            name="pose_head",
        )

        n_dense_ch = cfg.dense_adaptor.num_channels
        if cfg.dense_head_type == "dpt":
            dpt_feature = DPTFeature(
                hooks=cfg.dpt_hooks,
                input_feature_dims=(embed_dim,) + (cfg.info_sharing_dim,) * 3,
                layer_dims=cfg.dpt_layer_dims,
                feature_dim=cfg.dpt_feature_dim,
                dtype=fdt,
                name="dpt_feature_head",
            )
            dpt_regressor = DPTRegressionProcessor(
                output_dim=n_dense_ch, dtype=hdt, feature_dtype=fdt,
                name="dpt_regressor_head",
            )

            def run_dense(chunk):
                return dpt_regressor(dpt_feature(chunk), (H, W))

        elif cfg.dense_head_type == "moge":
            from mapanything_tpu.models.heads.moge_conv import MoGeConvFeature

            moge = MoGeConvFeature(output_dim=n_dense_ch, name="moge_head")

            def run_dense(chunk):
                return moge(chunk, (H, W))

        elif cfg.dense_head_type == "mae":
            from mapanything_tpu.models.heads.mae import MAEGeneralDecoder

            mae = MAEGeneralDecoder(
                output_dim=n_dense_ch, patch_size=cfg.patch_size, name="mae_head"
            )

            def run_dense(chunk):
                return mae(chunk, (H, W))

        elif cfg.dense_head_type == "linear":
            from mapanything_tpu.models.heads.pose import LinearFeature

            lin = LinearFeature(
                output_dim=n_dense_ch, patch_size=cfg.patch_size, name="linear_head"
            )

            def run_dense(chunk):
                return lin(chunk[-1])

        else:
            raise ValueError(f"invalid dense_head_type: {cfg.dense_head_type}")

        if (
            cfg.head_chunk_size
            and cfg.head_chunk_size < B * V
            and not self.is_initializing()
        ):
            # Flax cannot create parameters inside lax.map; during init the
            # unchunked branch below runs once to build the head params
            # (same modules, so apply-time chunking sees identical trees).
            n = B * V
            c = cfg.head_chunk_size
            assert n % c == 0, "head_chunk_size must divide B*V"
            chunked = [x.reshape(n // c, c, h, w, x.shape[-1]) for x in dense_inputs]
            dense_raw = jax.lax.map(run_dense, chunked)
            dense_raw = dense_raw.reshape(n, H, W, -1)
        else:
            dense_raw = run_dense(dense_inputs)

        pose_raw = pose_head(dense_inputs[3])  # (B*V, 7) from final features
        scale_raw = MLPHead(output_dim=1, dtype=hdt, name="scale_head")(
            token_feats.astype(hdt)
        )  # (B, 1, 1)

        # ------------------------------------------------------------------
        # 9. Adaptors + scene-rep assembly (model.py:1801-2152)
        # ------------------------------------------------------------------
        dense_out = apply_dense_adaptor(dense_raw.astype(jnp.float32), cfg.dense_adaptor)
        pose_out = apply_pose_adaptor(pose_raw.astype(jnp.float32), cfg.pose_adaptor)
        scale = apply_scale_adaptor(scale_raw.astype(jnp.float32), cfg.scale_adaptor)
        scale = scale.reshape(B)  # (B,)

        return assemble_scene_representation(
            cfg, dense_out, pose_out, scale, B, V, H, W
        )


def assemble_scene_representation(
    cfg: MapAnythingConfig, dense_out, pose_out, scale, B, V, H, W
) -> Predictions:
    """Decode adapted channels into the factored metric scene representation.

    Parity: the forward tail of the reference (model.py:1801-2152) for all
    scene-rep families; metric scaling applied to points/depths/translations
    but not directions/quaternions.
    """
    slices = cfg.dense_adaptor.component_slices()
    value = dense_out.value.reshape(B, V, H, W, -1)
    s_bv = scale[:, None, None, None, None]  # for (B, V, H, W, C)
    s_bv3 = scale[:, None, None]  # for (B, V, 3)

    def comp(name):
        a, b = slices[name]
        return value[..., a:b]

    cam_trans = pose_out[..., :3].reshape(B, V, 3)
    cam_quats = pose_out[..., 3:7].reshape(B, V, 4)

    rgb = comp("rgb") if "rgb" in slices else None
    rep = cfg.scene_rep_type

    if rep == "pointmap":
        pts3d = comp("pointmap")
        preds = Predictions(
            pts3d=pts3d * s_bv,
            metric_scaling_factor=scale,
        )
    elif rep == "raymap+depth":
        origins = comp("ray_origins")
        dirs = comp("ray_directions")
        depth = comp("depth")
        pts3d = origins + dirs * depth
        preds = Predictions(
            pts3d=pts3d * s_bv,
            ray_origins=origins * s_bv,
            ray_directions=dirs,
            depth_along_ray=depth * s_bv,
            metric_scaling_factor=scale,
        )
    elif rep in ("raydirs+depth+pose", "raydirs+depth+rgb+pose"):
        dirs = comp("ray_directions")
        depth = comp("depth")
        pts3d = pointmap_from_rays_depth_pose(dirs, depth, cam_trans, cam_quats)
        pts3d_cam = dirs * depth
        preds = Predictions(
            pts3d=pts3d * s_bv,
            pts3d_cam=pts3d_cam * s_bv,
            ray_directions=dirs,
            depth_along_ray=depth * s_bv,
            cam_trans=cam_trans * s_bv3,
            cam_quats=cam_quats,
            metric_scaling_factor=scale,
            rgb=rgb,
        )
    elif rep == "campointmap+pose":
        pts3d_cam = comp("pointmap")
        depth = safe_norm(pts3d_cam, axis=-1, keepdims=True)
        dirs = pts3d_cam / jnp.maximum(depth, 1e-12)
        pts3d = pointmap_from_rays_depth_pose(dirs, depth, cam_trans, cam_quats)
        preds = Predictions(
            pts3d=pts3d * s_bv,
            pts3d_cam=pts3d_cam * s_bv,
            ray_directions=dirs,
            depth_along_ray=depth * s_bv,
            cam_trans=cam_trans * s_bv3,
            cam_quats=cam_quats,
            metric_scaling_factor=scale,
        )
    elif rep == "pointmap+raydirs+depth+pose":
        pts3d = comp("pointmap")
        dirs = comp("ray_directions")
        depth = comp("depth")
        pts3d_cam = dirs * depth
        if cfg.use_factored_predictions_for_global_pointmaps:
            pts3d = pointmap_from_rays_depth_pose(dirs, depth, cam_trans, cam_quats)
        preds = Predictions(
            pts3d=pts3d * s_bv,
            pts3d_cam=pts3d_cam * s_bv,
            ray_directions=dirs,
            depth_along_ray=depth * s_bv,
            cam_trans=cam_trans * s_bv3,
            cam_quats=cam_quats,
            metric_scaling_factor=scale,
        )
    else:
        raise ValueError(f"invalid scene_rep_type: {rep}")

    if dense_out.confidence is not None:
        conf = dense_out.confidence.reshape(B, V, H, W)
        preds = preds.replace(conf=conf)
    if dense_out.mask is not None:
        probs = dense_out.mask.reshape(B, V, H, W)
        logits = dense_out.logits.reshape(B, V, H, W)
        preds = preds.replace(
            non_ambiguous_mask=probs > 0.5, non_ambiguous_mask_logits=logits
        )
    return preds
