"""Tests for the native external baselines (VGGT, MoGe)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mapanything_tpu.models.external.moge import (
    MoGeConfig,
    MoGeWrapper,
    normalized_view_plane_uv,
    recover_focal_shift,
    remap_points,
)
from mapanything_tpu.models.external.vggt import (
    VGGTConfig,
    VGGTWrapper,
    pose_encoding_to_extri_intri,
)
from mapanything_tpu.models.registry import init_model


class TestVGGT:
    def test_forward_shapes(self):
        cfg = VGGTConfig.small()
        wrapper = VGGTWrapper(cfg)
        B, V, H, W = 1, 2, 28, 28
        images = jnp.asarray(
            np.random.RandomState(0).rand(B, V, H, W, 3), jnp.float32
        )
        params = jax.jit(wrapper.init)(jax.random.PRNGKey(0), images)
        res = wrapper.apply(params, images)
        assert len(res) == V
        for view in res:
            assert view["pts3d"].shape == (B, H, W, 3)
            assert view["pts3d_cam"].shape == (B, H, W, 3)
            assert view["ray_directions"].shape == (B, H, W, 3)
            assert view["depth_along_ray"].shape == (B, H, W, 1)
            assert view["cam_trans"].shape == (B, 3)
            assert view["cam_quats"].shape == (B, 4)
            assert view["conf"].shape == (B, H, W)
            assert np.isfinite(np.asarray(view["pts3d"])).all()
            assert (np.asarray(view["conf"]) >= 1.0).all()
            # unit ray directions
            norms = np.linalg.norm(np.asarray(view["ray_directions"]), axis=-1)
            np.testing.assert_allclose(norms, 1.0, atol=1e-5)

    def test_pose_encoding_decode(self):
        # identity quat (w=1), known fov -> centred pinhole K
        pose_enc = jnp.asarray(
            [[[0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, np.pi / 2, np.pi / 2]]]
        )
        w2c, K = pose_encoding_to_extri_intri(pose_enc, (100, 200))
        np.testing.assert_allclose(np.asarray(w2c[0, 0]), np.eye(4), atol=1e-6)
        assert K[0, 0, 1, 1] == pytest.approx(50.0, rel=1e-5)  # H/2 / tan(45)
        assert K[0, 0, 0, 0] == pytest.approx(100.0, rel=1e-5)
        assert K[0, 0, 0, 2] == pytest.approx(100.0)

    def test_registry(self):
        wrapper = init_model("vggt", size="small")
        assert isinstance(wrapper, VGGTWrapper)


class TestMoGe:
    def test_forward_shapes(self):
        wrapper = MoGeWrapper(MoGeConfig.small())
        B, H, W = 1, 28, 28
        images = jnp.asarray(
            np.random.RandomState(0).rand(B, H, W, 3), jnp.float32
        )
        params = jax.jit(wrapper.init)(jax.random.PRNGKey(0), images)
        res = wrapper.apply(params, images)
        assert len(res) == 1
        view = res[0]
        assert view["pts3d"].shape == (B, H, W, 3)
        assert view["depth_z"].shape == (B, H, W, 1)
        assert view["intrinsics"].shape == (B, 3, 3)
        assert view["non_ambiguous_mask"].shape == (B, H, W)
        assert np.isfinite(np.asarray(view["pts3d"])).all()
        assert (np.asarray(view["intrinsics"])[:, 0, 0] > 0).all()

    def test_recover_focal_shift_exact(self):
        # Build a synthetic pinhole point map, shift z, and recover.
        H, W = 32, 32
        uv = normalized_view_plane_uv(H, W)
        rng = np.random.RandomState(0)
        true_focal = 1.7
        depth = jnp.asarray(1.0 + rng.rand(H, W).astype(np.float32) * 2.0)
        # points with z' = z - shift (affine ambiguity)
        true_shift = 0.6
        xy = np.asarray(uv) / true_focal * np.asarray(depth)[..., None]
        pts = jnp.concatenate(
            [jnp.asarray(xy), (depth - true_shift)[..., None]], axis=-1
        )[None]
        focal, shift = recover_focal_shift(pts, downsample=1)
        assert float(focal[0]) == pytest.approx(true_focal, rel=0.05)
        assert float(shift[0]) == pytest.approx(true_shift, rel=0.15)

    def test_remap_modes(self):
        x = jnp.asarray(np.random.RandomState(0).randn(2, 4, 4, 3), jnp.float32)
        assert (remap_points(x, "linear") == x).all()
        z = remap_points(x, "exp")[..., 2]
        assert (np.asarray(z) > 0).all()
        z = remap_points(x, "sinh_exp")[..., 2]
        assert (np.asarray(z) > 0).all()
        with pytest.raises(ValueError):
            remap_points(x, "bogus")

    def test_registry(self):
        wrapper = init_model("moge", size="small")
        assert isinstance(wrapper, MoGeWrapper)


class TestRadioCosmosEncoders:
    def test_radio_encoder(self):
        from mapanything_tpu.models.encoders import encoder_factory

        enc = encoder_factory("radio", size_override="test", patch_size=16)
        x = jnp.asarray(np.random.RandomState(0).rand(1, 32, 32, 3), jnp.float32)
        p = jax.jit(enc.init)(jax.random.PRNGKey(0), x)
        out = enc.apply(p, x)
        assert out.shape == (1, 2, 2, 64)
        assert np.isfinite(np.asarray(out)).all()

    def test_cosmos_encoder(self):
        from mapanything_tpu.models.encoders import encoder_factory

        enc = encoder_factory(
            "cosmos", patch_size=8, channels=16, channels_mult=(2, 2, 2)
        )
        x = jnp.asarray(np.random.RandomState(0).rand(1, 32, 32, 3), jnp.float32)
        p = jax.jit(enc.init)(jax.random.PRNGKey(0), x)
        out = enc.apply(p, x)
        assert out.shape == (1, 4, 4, 16)  # spatial compression 8, latent 16
        assert np.isfinite(np.asarray(out)).all()

    def test_haar_energy_preserving(self):
        from mapanything_tpu.models.encoders.cosmos import haar_downsample

        x = jnp.asarray(np.random.RandomState(0).randn(1, 8, 8, 2), jnp.float32)
        y = haar_downsample(x)
        assert y.shape == (1, 4, 4, 8)
        # orthonormal haar transform preserves total energy
        np.testing.assert_allclose(
            float(jnp.sum(x**2)), float(jnp.sum(y**2)), rtol=1e-5
        )
