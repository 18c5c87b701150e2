"""Tests: RoPE2D, CroCo encoder, info-sharing variants, DUSt3R, registry, config."""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mapanything_tpu.models.encoders.croco import CroCoEncoder, PatchEmbedder
from mapanything_tpu.models.info_sharing.cross_attention import (
    CrossAttentionTransformer,
)
from mapanything_tpu.models.info_sharing.global_attention import (
    GlobalAttentionTransformer,
)
from mapanything_tpu.models.modular_dust3r import ModularDUSt3R, ModularDUSt3RConfig
from mapanything_tpu.models.registry import MODEL_REGISTRY, init_model
from mapanything_tpu.ops.rope import patch_position_grid, rope_2d
from mapanything_tpu.utils.config import load_config

REPO = Path(__file__).resolve().parents[1]


class TestRope2D:
    def test_preserves_norm(self):
        rng = np.random.RandomState(0)
        tokens = jnp.asarray(rng.randn(2, 12, 2, 64).astype(np.float32))
        pos = patch_position_grid(2, 3, 4)
        out = rope_2d(tokens, pos)
        np.testing.assert_allclose(
            np.asarray(jnp.linalg.norm(out, axis=-1)),
            np.asarray(jnp.linalg.norm(tokens, axis=-1)),
            atol=1e-4,
        )

    def test_relative_property(self):
        # <rope(q, p1), rope(k, p2)> depends only on p1 - p2 (per axis)
        rng = np.random.RandomState(1)
        q = jnp.asarray(rng.randn(1, 1, 1, 64).astype(np.float32))
        k = jnp.asarray(rng.randn(1, 1, 1, 64).astype(np.float32))

        def score(py1, px1, py2, px2):
            pq = jnp.asarray([[[py1, px1]]], jnp.int32)
            pk = jnp.asarray([[[py2, px2]]], jnp.int32)
            rq = rope_2d(q, pq)
            rk = rope_2d(k, pk)
            return float(jnp.sum(rq * rk))

        s1 = score(3, 5, 1, 2)
        s2 = score(13, 25, 11, 22)  # same (dy, dx) = (2, 3)
        assert abs(s1 - s2) < 1e-3

    def test_zero_position_identity(self):
        rng = np.random.RandomState(2)
        tokens = jnp.asarray(rng.randn(1, 4, 1, 64).astype(np.float32))
        pos = jnp.zeros((1, 4, 2), jnp.int32)
        out = rope_2d(tokens, pos)
        np.testing.assert_allclose(np.asarray(out), np.asarray(tokens), atol=1e-6)


class TestEncoders:
    def test_croco_encoder_shapes(self):
        enc = CroCoEncoder(patch_size=16, embed_dim=128, depth=2, num_heads=4)
        x = jnp.zeros((1, 64, 64, 3))
        params = enc.init(jax.random.PRNGKey(0), x)
        out = enc.apply(params, x)
        assert out.shape == (1, 4, 4, 128)

    def test_croco_intermediates(self):
        enc = CroCoEncoder(
            patch_size=16, embed_dim=128, depth=3, num_heads=4, return_layers=(0, 1)
        )
        x = jnp.zeros((1, 32, 32, 3))
        params = enc.init(jax.random.PRNGKey(0), x)
        inters, out = enc.apply(params, x)
        assert len(inters) == 2 and out.shape == (1, 2, 2, 128)

    def test_patch_embedder(self):
        pe = PatchEmbedder(patch_size=14, embed_dim=96)
        x = jnp.zeros((2, 28, 28, 3))
        params = pe.init(jax.random.PRNGKey(0), x)
        assert pe.apply(params, x).shape == (2, 2, 2, 96)


class TestInfoSharingVariants:
    def _features(self, B=1, V=3, h=4, w=4, c=64):
        rng = np.random.RandomState(0)
        return jnp.asarray(rng.randn(B, V, h, w, c).astype(np.float32))

    def test_global_attention(self):
        m = GlobalAttentionTransformer(
            input_embed_dim=64, depth=2, dim=96, num_heads=4, indices=(0,)
        )
        feats = self._features()
        tokens = jnp.zeros((1, 1, 64))
        params = m.init(jax.random.PRNGKey(0), feats, tokens)
        out, inters, tok = m.apply(params, feats, tokens)
        assert out.shape == (1, 3, 4, 4, 96)
        assert len(inters) == 1 and tok.shape == (1, 1, 96)

    def test_cross_attention(self):
        m = CrossAttentionTransformer(
            input_embed_dim=64, depth=2, dim=96, num_heads=4, indices=(0,)
        )
        feats = self._features()
        params = m.init(jax.random.PRNGKey(0), feats)
        out, inters = m.apply(params, feats)
        assert out.shape == (1, 3, 4, 4, 96)
        assert len(inters) == 1

    def test_diff_cross_attention(self):
        # Differential variant (reference diff_cross_attention_transformer.py:22)
        m = CrossAttentionTransformer(
            input_embed_dim=64, depth=2, dim=96, num_heads=4, indices=(0,),
            differential=True,
        )
        feats = self._features()
        params = m.init(jax.random.PRNGKey(0), feats)
        out, inters = m.apply(params, feats)
        assert out.shape == (1, 3, 4, 4, 96)
        assert len(inters) == 1
        assert np.isfinite(np.asarray(out)).all()
        # diff lambdas live under the cross_attn of every branch block
        ca = params["params"]["ref_block_0"]["cross_attn"]
        assert "lambda_q1" in ca and "subln" in ca

    def test_diff_self_attention_block(self):
        from mapanything_tpu.models.blocks import SelfAttentionBlock

        m = SelfAttentionBlock(dim=64, num_heads=4, differential=True, layer_depth=2)
        x = jnp.asarray(np.random.RandomState(0).randn(2, 16, 64), jnp.float32)
        p = m.init(jax.random.PRNGKey(0), x)
        out = m.apply(p, x)
        assert out.shape == (2, 16, 64)
        assert np.isfinite(np.asarray(out)).all()


class TestModularDUSt3R:
    def test_forward(self):
        cfg = ModularDUSt3RConfig(
            enc_embed_dim=96, enc_depth=2, enc_num_heads=4,
            dec_embed_dim=64, dec_depth=3, dec_num_heads=4,
            dpt_feature_dim=32, dpt_layer_dims=(16, 24, 32, 48),
            indices=(0, 1),
        )
        model = ModularDUSt3R(cfg)
        imgs = jnp.zeros((1, 2, 64, 64, 3))
        params = jax.jit(model.init)(jax.random.PRNGKey(0), imgs)
        preds = model.apply(params, imgs)
        assert preds.pts3d.shape == (1, 2, 64, 64, 3)
        assert preds.conf.shape == (1, 2, 64, 64)
        assert bool(jnp.all(preds.conf >= 1.0))


class TestRegistry:
    def test_known_models(self):
        for name in ("mapanything", "mapanything_ablations", "modular_dust3r"):
            assert name in MODEL_REGISTRY

    def test_external_all_native(self):
        # All 9 external baselines are registered with native implementations.
        for name in (
            "vggt", "moge", "pi3", "anycalib", "dust3r_ba",
            "mast3r_sga", "must3r", "pow3r", "pow3r_ba",
        ):
            assert name in MODEL_REGISTRY
        # Constructing one of the later additions should succeed natively.
        m = init_model("pi3")
        assert m is not None

    def test_ablations_scene_rep(self):
        m = init_model("mapanything_ablations", scene_rep_type="pointmap")
        assert m.config.scene_rep_type == "pointmap"
        assert m.config.dense_adaptor.components == ("pointmap",)


class TestConfigSystem:
    def test_compose_train_config(self):
        cfg = load_config(REPO / "configs" / "train.yaml")
        assert cfg["model"]["encoder"]["size"] == "large"
        assert cfg["model"]["info_sharing"]["depth"] == 24
        assert cfg["model"]["info_sharing"]["indices"] == [11, 17]
        assert cfg["model"]["pred_head"]["scene_rep_type"] == "raydirs+depth+pose"
        assert cfg["loss"]["conf_alpha"] == 0.2
        assert cfg["train_params"]["lr"] == 1e-4

    def test_defaults_chain_and_override(self):
        cfg = load_config(
            REPO / "configs" / "model" / "info_sharing" / "aat_ifr_24_layers_escaling.yaml"
        )
        assert cfg["use_entropy_scaling"] is True
        assert cfg["depth"] == 24  # inherited

    def test_cli_overrides(self):
        cfg = load_config(
            REPO / "configs" / "train.yaml",
            overrides=["train_params.lr=5e-5", "model.info_sharing.depth=12"],
        )
        assert cfg["train_params"]["lr"] == 5e-5
        assert cfg["model"]["info_sharing"]["depth"] == 12

    def test_all_task_presets_load(self):
        """Every reference task preset (configs/model/task/*.yaml, 18
        presets) maps onto GeometricInputConfig."""
        import dataclasses

        from mapanything_tpu.models.mapanything import GeometricInputConfig

        fields = {f.name for f in dataclasses.fields(GeometricInputConfig)}
        task_dir = REPO / "configs" / "model" / "task"
        names = sorted(p.stem for p in task_dir.glob("*.yaml"))
        # 18 presets + the default base (reference task/default.yaml)
        assert len(names) == 19, names
        for expected in (
            "images_only", "mvs", "calibrated_sfm", "posed_sfm",
            "depth_completion", "registration", "aug_training",
            "pass_through", "rgb_prediction", "mvs_non_metric",
        ):
            assert expected in names
        for name in names:
            cfg = load_config(task_dir / f"{name}.yaml")
            known = {k: v for k, v in cfg.items() if k in fields}
            geo = GeometricInputConfig(**known)
            assert 0.0 <= geo.overall_prob <= 1.0


if __name__ == "__main__":
    pytest.main([__file__, "-q", "-x"])


class TestDiffAttentionAndSeg:
    def test_diff_attention_shapes(self):
        from mapanything_tpu.models.blocks import DiffAttention

        m = DiffAttention(dim=64, depth=3, num_heads=4)
        x = jnp.asarray(np.random.RandomState(0).randn(2, 16, 64), jnp.float32)
        p = m.init(jax.random.PRNGKey(0), x)
        out = m.apply(p, x)
        assert out.shape == (2, 16, 64)
        assert np.isfinite(np.asarray(out)).all()

    def test_dpt_segmentation_processor(self):
        from mapanything_tpu.models.heads.dpt import DPTSegmentationProcessor

        m = DPTSegmentationProcessor(output_dim=5)
        x = jnp.zeros((1, 16, 16, 32))
        p = m.init(jax.random.PRNGKey(0), x, (64, 64))
        out = m.apply(p, x, (64, 64))
        assert out.shape == (1, 64, 64, 5)

    def test_encoder_factory(self):
        from mapanything_tpu.models.encoders import encoder_factory

        enc = encoder_factory("patch_embedder", patch_size=14, embed_dim=32)
        x = jnp.zeros((1, 28, 28, 3))
        p = enc.init(jax.random.PRNGKey(0), x)
        assert enc.apply(p, x).shape == (1, 2, 2, 32)
        # cosmos/radio are native now; unknown names still KeyError
        assert encoder_factory("cosmos") is not None
        with pytest.raises(KeyError):
            encoder_factory("nope")


class TestAlignCornersResize:
    """The MXU interpolation-matrix resize vs an explicit gather reference."""

    @staticmethod
    def _reference(x, out_hw):
        h, w = x.shape[-3:-1]
        oh, ow = out_hw
        ys = np.arange(oh) * ((h - 1) / (oh - 1) if oh > 1 else 0.0)
        xs = np.arange(ow) * ((w - 1) / (ow - 1) if ow > 1 else 0.0)
        y0 = np.clip(np.floor(ys).astype(int), 0, h - 1)
        y1 = np.clip(y0 + 1, 0, h - 1)
        x0 = np.clip(np.floor(xs).astype(int), 0, w - 1)
        x1 = np.clip(x0 + 1, 0, w - 1)
        wy = (ys - y0)[:, None, None]
        wx = (xs - x0)[None, :, None]
        row = x[..., y0, :, :] * (1 - wy) + x[..., y1, :, :] * wy
        return row[..., :, x0, :] * (1 - wx) + row[..., :, x1, :] * wx

    @pytest.mark.parametrize(
        "in_hw,out_hw",
        [((19, 19), (38, 38)), ((37, 41), (74, 82)), ((21, 21), (37, 37)),
         ((16, 16), (9, 9)), ((5, 5), (5, 5)), ((1, 4), (3, 8))],
    )
    def test_matches_gather_reference(self, in_hw, out_hw):
        from mapanything_tpu.models.heads.dpt import _resize_bilinear_align_corners

        rng = np.random.RandomState(0)
        x = rng.randn(2, *in_hw, 7).astype(np.float32)
        got = np.asarray(_resize_bilinear_align_corners(jnp.asarray(x), out_hw))
        want = self._reference(x, out_hw)
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_mlp_feature_head():
    """MLPFeature (reference prediction_heads/mlp_feature.py:16): Mlp
    residual stage + pixel-shuffle linear unpatchify."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mapanything_tpu.models.heads.pose import MLPFeature

    m = MLPFeature(output_dim=3, patch_size=4)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 3, 5, 16), jnp.float32)
    p = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(p, x)
    assert y.shape == (2, 12, 20, 3)
    assert np.isfinite(np.asarray(y)).all()


def test_every_config_yaml_parses_and_apps_compose():
    """All 170 YAMLs parse; every top-level app config composes; every
    dataset/megatrain + train_params + loss + model group loads."""
    from pathlib import Path

    import yaml

    from mapanything_tpu.utils.config import load_config

    root = Path(__file__).resolve().parent.parent / "configs"
    files = sorted(root.rglob("*.yaml"))
    assert len(files) >= 160, len(files)
    for f in files:
        with open(f) as fh:
            yaml.safe_load(fh)

    for app in ("train.yaml", "finetune.yaml", "dense_n_view_benchmark.yaml",
                "calibration_benchmark.yaml", "rmvd_benchmark.yaml",
                "inference.yaml"):
        load_config(root / app)

    # every dataset recipe composes under train.yaml via a GROUP override
    for recipe in sorted((root / "dataset").glob("megatrain_*.yaml")):
        cfg = load_config(
            root / "train.yaml", overrides=[f"dataset={recipe.stem}"]
        )
        assert "train_dataset" in cfg["dataset"], recipe.stem
        assert "${" not in str(cfg["dataset"]["train_dataset"])
    # stage-2: 24-view recipe + finetune params compose together
    cfg = load_config(
        root / "train.yaml",
        overrides=["dataset=megatrain_13d_518_many_ar_24v_48ipg_64g",
                   "train_params=lower_encoder_lr_64g"],
    )
    assert cfg["dataset"]["num_views"] == 24
    assert cfg["train_params"]["submodule_configs"]["encoder"]["lr_scale"] == 0.1
    for group, names in {
        "loss": [p.stem for p in (root / "loss").glob("*.yaml")],
        "train_params": [p.stem for p in (root / "train_params").glob("*.yaml")],
    }.items():
        for name in names:
            load_config(root / group / f"{name}.yaml", config_dir=root / group)
