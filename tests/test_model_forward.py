"""End-to-end forward smoke tests for the MapAnything model (small config)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mapanything_tpu.models.mapanything import (
    GeometricInputConfig,
    MapAnything,
    MapAnythingConfig,
    Views,
    full_modality_masks,
    sample_modality_masks,
)

B, V, H, W = 1, 2, 56, 56  # 4x4 patches at patch_size 14


@pytest.fixture(scope="module")
def small_model():
    cfg = MapAnythingConfig.small()
    model = MapAnything(cfg)
    rng = jax.random.PRNGKey(0)
    views = make_views(with_geometry=True)
    params = model.init(rng, views)
    return model, params, cfg


def make_views(with_geometry: bool):
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(B, V, H, W, 3).astype(np.float32))
    if not with_geometry:
        return Views(img=img)
    dirs = rng.randn(B, V, H, W, 3).astype(np.float32)
    dirs[..., 2] = np.abs(dirs[..., 2]) + 0.5
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    quats = rng.randn(B, V, 4).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    return Views(
        img=img,
        ray_directions=jnp.asarray(dirs),
        depth_along_ray=jnp.asarray(
            rng.uniform(1.0, 5.0, (B, V, H, W, 1)).astype(np.float32)
        ),
        camera_pose_quats=jnp.asarray(quats),
        camera_pose_trans=jnp.asarray(rng.randn(B, V, 3).astype(np.float32)),
        is_metric_scale=jnp.ones((B, V), bool),
    )


class TestForward:
    def test_images_only_shapes(self, small_model):
        model, params, cfg = small_model
        views = make_views(with_geometry=False)
        preds = model.apply(params, views)
        assert preds.pts3d.shape == (B, V, H, W, 3)
        assert preds.pts3d_cam.shape == (B, V, H, W, 3)
        assert preds.ray_directions.shape == (B, V, H, W, 3)
        assert preds.depth_along_ray.shape == (B, V, H, W, 1)
        assert preds.cam_trans.shape == (B, V, 3)
        assert preds.cam_quats.shape == (B, V, 4)
        assert preds.metric_scaling_factor.shape == (B,)
        assert preds.conf.shape == (B, V, H, W)
        assert preds.non_ambiguous_mask.shape == (B, V, H, W)
        # invariants
        ray_norms = np.linalg.norm(np.asarray(preds.ray_directions), axis=-1)
        np.testing.assert_allclose(ray_norms, 1.0, atol=1e-5)
        quat_norms = np.linalg.norm(np.asarray(preds.cam_quats), axis=-1)
        np.testing.assert_allclose(quat_norms, 1.0, atol=1e-5)
        assert bool(jnp.all(preds.depth_along_ray >= 0))
        assert bool(jnp.all(preds.conf >= 1.0))
        assert np.isfinite(np.asarray(preds.pts3d)).all()

    def test_factored_consistency(self, small_model):
        # pts3d_cam == dirs * depth; pts3d == R q (pts_cam) + t (all pre-scale)
        model, params, cfg = small_model
        views = make_views(with_geometry=False)
        preds = model.apply(params, views)
        s = np.asarray(preds.metric_scaling_factor)[:, None, None, None, None]
        lhs = np.asarray(preds.pts3d_cam)
        rhs = np.asarray(preds.ray_directions) * np.asarray(preds.depth_along_ray)
        np.testing.assert_allclose(lhs, rhs, atol=1e-4)

    def test_multimodal_forward(self, small_model):
        model, params, cfg = small_model
        views = make_views(with_geometry=True)
        masks = full_modality_masks(B, V, True, True, True)
        preds = model.apply(params, views, masks)
        assert np.isfinite(np.asarray(preds.pts3d)).all()

    def test_modality_mask_zeroing_matches_absent_input(self, small_model):
        # All-False geometry masks must produce identical outputs to
        # providing the modality as zeros (the mask-multiply design).
        model, params, cfg = small_model
        views = make_views(with_geometry=True)
        masks_off = full_modality_masks(B, V, False, False, False)
        preds_masked = model.apply(params, views, masks_off)
        views_zero = Views(
            img=views.img,
            ray_directions=jnp.zeros_like(views.ray_directions),
            depth_along_ray=jnp.zeros_like(views.depth_along_ray),
            camera_pose_quats=jnp.broadcast_to(
                jnp.asarray([0.0, 0, 0, 1.0]), (B, V, 4)
            ),
            camera_pose_trans=jnp.zeros((B, V, 3)),
            is_metric_scale=views.is_metric_scale,
        )
        preds_zero = model.apply(params, views_zero, masks_off)
        np.testing.assert_allclose(
            np.asarray(preds_masked.pts3d), np.asarray(preds_zero.pts3d), atol=1e-5
        )

    def test_sample_modality_masks_shapes(self):
        cfg = GeometricInputConfig()
        masks = sample_modality_masks(jax.random.PRNGKey(0), 4, 3, (28, 28), cfg)
        assert masks.rgb.shape == (4, 3)
        assert masks.ray_dirs.dtype == jnp.bool_
        assert masks.depth_sparsification_keep.shape == (4, 3, 28, 28, 1)
        # rays/cam forced on where rgb is off
        assert bool(jnp.all(masks.ray_dirs | masks.rgb))

    def test_images_only_task_masks_disable_geometry(self):
        cfg = GeometricInputConfig(
            overall_prob=0.0, dropout_prob=1.0, ray_dirs_prob=0.0,
            depth_prob=0.0, cam_prob=0.0, sparse_depth_prob=0.0,
        )
        masks = sample_modality_masks(jax.random.PRNGKey(1), 4, 3, (28, 28), cfg)
        assert not bool(jnp.any(masks.ray_dirs))
        assert not bool(jnp.any(masks.depth))
        assert not bool(jnp.any(masks.cam))
        assert bool(jnp.all(masks.rgb))


if __name__ == "__main__":
    pytest.main([__file__, "-q", "-x"])


class TestHeadVariants:
    """Dense-head family dispatch: moge / mae / linear + RGB scene rep."""

    def _views(self):
        return make_views(with_geometry=False)

    @pytest.mark.parametrize("head", ["moge", "mae", "linear"])
    def test_dense_head_types(self, head):
        cfg = MapAnythingConfig.small(dense_head_type=head)
        model = MapAnything(cfg)
        views = self._views()
        params = jax.jit(model.init)(jax.random.PRNGKey(0), views)
        preds = model.apply(params, views)
        assert preds.pts3d.shape == (B, V, H, W, 3)
        assert bool(jnp.isfinite(preds.pts3d).all())

    def test_chunked_head_init_and_apply(self):
        """head_chunk_size < B*V must work for BOTH init (params created
        outside lax.map) and apply (chunked), with identical outputs."""
        cfg = MapAnythingConfig.small(head_chunk_size=1)
        model = MapAnything(cfg)
        views = self._views()
        params = jax.jit(model.init)(jax.random.PRNGKey(0), views)  # B*V=2 > 1
        preds = model.apply(params, views)
        assert preds.pts3d.shape == (B, V, H, W, 3)
        # chunked apply == unchunked apply with the same params
        ref_model = MapAnything(MapAnythingConfig.small())
        ref = ref_model.apply(params, views)
        np.testing.assert_allclose(
            np.asarray(preds.pts3d), np.asarray(ref.pts3d), rtol=1e-4, atol=1e-4
        )

    def test_rgb_scene_rep(self):
        from mapanything_tpu.models.heads.adaptors import DenseAdaptorConfig

        cfg = MapAnythingConfig.small(
            scene_rep_type="raydirs+depth+rgb+pose",
            dense_adaptor=DenseAdaptorConfig(
                components=("ray_directions", "depth", "rgb"),
                with_confidence=True,
                with_mask=True,
            ),
        )
        model = MapAnything(cfg)
        views = self._views()
        params = jax.jit(model.init)(jax.random.PRNGKey(0), views)
        preds = model.apply(params, views)
        assert preds.rgb.shape == (B, V, H, W, 3)
        assert bool(jnp.all((preds.rgb >= 0) & (preds.rgb <= 1)))


def test_raw_encoder_features_mae_head():
    """Feature-returner preset: the raw encoder output joins the MAE
    head's feature list (reference model.py:166-172,1725-1737)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mapanything_tpu.models.mapanything import (
        MapAnything,
        MapAnythingConfig,
        Views,
    )

    cfg = MapAnythingConfig.small(
        dense_head_type="mae",
        scene_rep_type="raydirs+depth+rgb+pose",
        use_raw_encoder_features_for_dpt=True,
    )
    from dataclasses import replace

    from mapanything_tpu.models.heads.adaptors import (
        DenseAdaptorConfig,
        dense_components_for_scene_rep,
    )

    cfg = cfg.with_updates(
        dense_adaptor=DenseAdaptorConfig(
            components=dense_components_for_scene_rep("raydirs+depth+rgb+pose"),
            with_confidence=True,
            with_mask=True,
        )
    )
    model = MapAnything(cfg)
    views = Views(img=jnp.asarray(
        np.random.RandomState(0).rand(1, 2, 28, 28, 3), jnp.float32
    ))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), views)
    preds = model.apply(params, views)
    assert preds.rgb is not None and preds.rgb.shape == (1, 2, 28, 28, 3)
    assert np.isfinite(np.asarray(preds.pts3d)).all()
    # the MAE head saw 5 feature levels: embed_4 exists
    assert "embed_4" in params["params"]["mae_head"]
