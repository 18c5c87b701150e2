"""Parity tests for the full-MapAnything torch->flax weight converter.

Builds torch modules at test scale with the REFERENCE's parameter naming
(mapanything/models/mapanything/model.py:96-231 and the uniception
submodules), converts with ``convert_mapanything``'s sub-converters, and
checks numerical agreement of each submodule against our flax modules.
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from mapanything_tpu.utils.torch_convert import (
    convert_dense_rep_encoder,
    convert_dpt_regressor,
    convert_global_rep_encoder,
    convert_alternating_transformer,
    convert_mlp_head,
    convert_pose_head,
)


def sd_np(mod):
    return {k: v.detach().numpy() for k, v in mod.state_dict().items()}


class TorchResidualBlock(tnn.Module):
    # reference dense_rep_encoder.py:31
    def __init__(self, cin, cout):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, cout, 3, 1, 1)
        self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1)
        self.shortcut = (
            tnn.Conv2d(cin, cout, 1, 1, 0) if cin != cout else tnn.Identity()
        )

    def forward(self, x):
        out = self.conv2(torch.nn.functional.gelu(self.conv1(x)))
        return torch.nn.functional.gelu(out + self.shortcut(x))


class TorchDenseRep(tnn.Module):
    # reference dense_rep_encoder.py:55 ("embed" layout, apply_pe handled
    # outside: the sinusoid table is a buffer)
    def __init__(self, in_ch, patch, dims, emb):
        super().__init__()
        self.conv_in = tnn.Conv2d(in_ch * patch * patch, dims[0], 3, 1, 1)
        layers = [
            TorchResidualBlock(dims[i], dims[i + 1])
            for i in range(len(dims) - 1)
        ]
        layers.append(tnn.Conv2d(dims[-1], emb, 1, 1, 0))
        self.encoder = tnn.Sequential(*layers)
        self.norm_layer = tnn.LayerNorm(emb, eps=1e-6)
        self.post_pe_norm = tnn.LayerNorm(emb, eps=1e-6)
        self.patch = patch

    def forward(self, x):  # x (B, C, H, W) -> (B, h, w, emb), pre-PE norm
        x = tnn.functional.pixel_unshuffle(x, self.patch)
        x = self.encoder(self.conv_in(x))
        x = x.permute(0, 2, 3, 1)
        return self.norm_layer(x)


class TorchGlobalRep(tnn.Module):
    # reference global_rep_encoder.py:14 (nested Sequential layout)
    def __init__(self, in_ch, dims, emb):
        super().__init__()
        act = tnn.GELU()
        enc = tnn.Sequential(tnn.Linear(in_ch, dims[0]), act)
        for i in range(1, len(dims)):
            enc = tnn.Sequential(enc, tnn.Linear(dims[i - 1], dims[i]), act)
        self.encoder = tnn.Sequential(enc, tnn.Linear(dims[-1], emb))
        self.norm_layer = tnn.LayerNorm(emb, eps=1e-6)

    def forward(self, x):
        return self.norm_layer(self.encoder(x))


class TorchBlock(tnn.Module):
    # reference transformer_blocks.py:370 (no qk-norm / layerscale, the
    # production trunk config)
    def __init__(self, dim, heads):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim, eps=1e-6)
        self.attn = tnn.Module()
        self.attn.qkv = tnn.Linear(dim, dim * 3)
        self.attn.proj = tnn.Linear(dim, dim)
        self.norm2 = tnn.LayerNorm(dim, eps=1e-6)
        self.mlp = tnn.Module()
        self.mlp.fc1 = tnn.Linear(dim, dim * 4)
        self.mlp.fc2 = tnn.Linear(dim * 4, dim)
        self.heads = heads

    def forward(self, x):
        B, N, C = x.shape
        y = self.norm1(x)
        qkv = (
            self.attn.qkv(y)
            .reshape(B, N, 3, self.heads, C // self.heads)
            .permute(2, 0, 3, 1, 4)
        )
        q, k, v = qkv[0], qkv[1], qkv[2]
        y = torch.nn.functional.scaled_dot_product_attention(q, k, v)
        y = self.attn.proj(y.transpose(1, 2).reshape(B, N, C))
        x = x + y
        y = self.norm2(x)
        y = self.mlp.fc2(torch.nn.functional.gelu(self.mlp.fc1(y)))
        return x + y


class TorchTrunk(tnn.Module):
    # reference alternating_attention_transformer.py:22 param layout
    def __init__(self, in_dim, dim, depth, heads):
        super().__init__()
        self.proj_embed = tnn.Linear(in_dim, dim)
        self.self_attention_blocks = tnn.ModuleList(
            [TorchBlock(dim, heads) for _ in range(depth)]
        )
        self.norm = tnn.LayerNorm(dim, eps=1e-6)


class TorchPoseHead(tnn.Module):
    # reference pose_head.py:50
    def __init__(self, dim, patch):
        super().__init__()
        out = 4 * patch * patch
        self.proj = tnn.Conv2d(dim, out, 1, 1, 0)

        def res_block():
            m = tnn.Module()
            m.res_conv1 = tnn.Conv2d(out, out, 1, 1, 0)
            m.res_conv2 = tnn.Conv2d(out, out, 1, 1, 0)
            m.res_conv3 = tnn.Conv2d(out, out, 1, 1, 0)
            return m

        self.res_conv = tnn.ModuleList([res_block() for _ in range(2)])
        self.more_mlps = tnn.Sequential(
            tnn.Linear(out, out), tnn.ReLU(), tnn.Linear(out, out), tnn.ReLU()
        )
        self.fc_t = tnn.Linear(out, 3)
        self.fc_rot = tnn.Linear(out, 4)

    def forward(self, feat):  # (B, C, h, w)
        x = self.proj(feat)
        for m in self.res_conv:
            y = torch.relu(m.res_conv1(x))
            y = torch.relu(m.res_conv2(y))
            y = torch.relu(m.res_conv3(y))
            x = x + y
        x = x.mean(dim=(2, 3))
        x = self.more_mlps(x)
        return self.fc_t(x), self.fc_rot(x)


class TorchMLPHead(tnn.Module):
    # reference mlp_head.py:13
    def __init__(self, in_dim, hidden, out_dim):
        super().__init__()
        self.proj = tnn.Linear(in_dim, hidden)
        self.mlp = tnn.ModuleList(
            [
                tnn.Sequential(tnn.Linear(hidden, hidden), tnn.ReLU())
                for _ in range(2)
            ]
        )
        self.output_proj = tnn.Linear(hidden, out_dim)

    def forward(self, x):
        x = self.proj(x)
        for m in self.mlp:
            x = m(x)
        return self.output_proj(x)


class TestSubmoduleParity:
    def test_dense_rep_encoder(self):
        from mapanything_tpu.models.encoders.dense_rep import (
            DenseRepresentationEncoder,
        )

        torch.manual_seed(0)
        tm = TorchDenseRep(3, 2, (12, 16), 8).eval()
        sd = {"enc." + k: v for k, v in sd_np(tm).items()}
        params = convert_dense_rep_encoder(sd, "enc.")

        ours = DenseRepresentationEncoder(
            in_chans=3,
            patch_size=2,
            intermediate_dims=(12, 16),
            enc_embed_dim=8,
            apply_pe=False,
        )
        x = np.random.RandomState(0).rand(1, 8, 8, 3).astype(np.float32)
        ref = tm(torch.from_numpy(x).permute(0, 3, 1, 2)).detach().numpy()
        got = np.asarray(ours.apply({"params": params}, jnp.asarray(x)))
        np.testing.assert_allclose(got, ref, atol=3e-4)

    def test_global_rep_encoder(self):
        from mapanything_tpu.models.encoders.dense_rep import (
            GlobalRepresentationEncoder,
        )

        torch.manual_seed(1)
        tm = TorchGlobalRep(4, (6, 8, 10), 8).eval()
        params = convert_global_rep_encoder(sd_np(tm), "")
        ours = GlobalRepresentationEncoder(
            in_chans=4, intermediate_dims=(6, 8, 10), enc_embed_dim=8
        )
        x = np.random.RandomState(1).rand(2, 4).astype(np.float32)
        ref = tm(torch.from_numpy(x)).detach().numpy()
        got = np.asarray(ours.apply({"params": params}, jnp.asarray(x)))
        np.testing.assert_allclose(got, ref, atol=3e-4)

    def test_trunk_block(self):
        from mapanything_tpu.models.blocks import SelfAttentionBlock

        torch.manual_seed(2)
        tb = TorchBlock(16, 4).eval()
        sd = {"self_attention_blocks.0." + k: v for k, v in sd_np(tb).items()}
        sd["proj_embed.weight"] = np.eye(16, dtype=np.float32)
        sd["proj_embed.bias"] = np.zeros(16, np.float32)
        sd["norm.weight"] = np.ones(16, np.float32)
        sd["norm.bias"] = np.zeros(16, np.float32)
        tree = convert_alternating_transformer(sd, "")

        ours = SelfAttentionBlock(dim=16, num_heads=4)
        x = np.random.RandomState(2).rand(1, 6, 16).astype(np.float32)
        ref = tb(torch.from_numpy(x)).detach().numpy()
        got = np.asarray(
            ours.apply({"params": tree["block_0"]}, jnp.asarray(x))
        )
        np.testing.assert_allclose(got, ref, atol=3e-4)

    def test_pose_head(self):
        from mapanything_tpu.models.heads.pose import PoseHead

        torch.manual_seed(3)
        tm = TorchPoseHead(12, 2).eval()
        params = convert_pose_head(sd_np(tm), "")
        ours = PoseHead(patch_size=2)
        x = np.random.RandomState(3).rand(1, 3, 3, 12).astype(np.float32)
        t_ref, r_ref = tm(torch.from_numpy(x).permute(0, 3, 1, 2))
        out = ours.apply({"params": params}, jnp.asarray(x))
        got = np.asarray(out)
        np.testing.assert_allclose(
            got[..., :3], t_ref.detach().numpy(), atol=3e-4
        )
        np.testing.assert_allclose(
            got[..., 3:], r_ref.detach().numpy(), atol=3e-4
        )

    def test_mlp_head(self):
        from mapanything_tpu.models.heads.pose import MLPHead

        torch.manual_seed(4)
        tm = TorchMLPHead(16, 12, 1).eval()
        params = convert_mlp_head(sd_np(tm), "")
        ours = MLPHead(hidden_dim=12, output_dim=1)
        x = np.random.RandomState(4).rand(2, 1, 16).astype(np.float32)
        ref = tm(torch.from_numpy(x)).detach().numpy()
        got = np.asarray(ours.apply({"params": params}, jnp.asarray(x)))
        np.testing.assert_allclose(got.reshape(ref.shape), ref, atol=3e-4)

    def test_dpt_regressor(self):
        from mapanything_tpu.models.heads.dpt import DPTRegressionProcessor

        torch.manual_seed(5)

        class TorchReg(tnn.Module):
            # reference dpt.py:238 (conv1 -> interpolate x2 -> conv2)
            def __init__(self):
                super().__init__()
                self.conv1 = tnn.Conv2d(8, 6, 3, 1, 1)
                self.conv2 = tnn.Sequential(
                    tnn.Conv2d(6, 4, 3, 1, 1),
                    tnn.ReLU(),
                    tnn.Conv2d(4, 2, 1, 1, 0),
                )

            def forward(self, x, hw):
                x = self.conv1(x)
                x = tnn.functional.interpolate(
                    x, size=hw, mode="bilinear", align_corners=True
                )
                return self.conv2(x)

        tm = TorchReg().eval()
        params = convert_dpt_regressor(sd_np(tm), "")
        ours = DPTRegressionProcessor(
            output_dim=2, hidden_dims=(6, 4)
        )
        x = np.random.RandomState(5).rand(1, 4, 4, 8).astype(np.float32)
        ref = (
            tm(torch.from_numpy(x).permute(0, 3, 1, 2), (8, 8))
            .permute(0, 2, 3, 1)
            .detach()
            .numpy()
        )
        got = np.asarray(
            ours.apply({"params": params}, jnp.asarray(x), (8, 8))
        )
        np.testing.assert_allclose(got, ref, atol=2e-4)


class TestFullTreeShapes:
    def test_converted_tree_matches_init_shapes(self):
        """Assemble a full torch state dict at test scale with the
        reference's top-level names and check convert_mapanything produces
        exactly our init tree's shapes for every converted subtree."""
        pytest.importorskip("torch")
        from mapanything_tpu.utils.torch_convert import convert_mapanything

        torch.manual_seed(6)
        sd = {}

        # encoder.model.*: DINOv2-style ViT at our small config's scale
        emb, depth = 384, 12
        sd["encoder.model.patch_embed.proj.weight"] = np.random.randn(
            emb, 3, 14, 14
        ).astype(np.float32)
        sd["encoder.model.patch_embed.proj.bias"] = np.zeros(emb, np.float32)
        sd["encoder.model.cls_token"] = np.zeros((1, 1, emb), np.float32)
        sd["encoder.model.pos_embed"] = np.zeros((1, 1370, emb), np.float32)
        for i in range(depth):
            b = TorchBlock(emb, 6)
            ls = {
                f"encoder.model.blocks.{i}.ls1.gamma": np.ones(emb, np.float32),
                f"encoder.model.blocks.{i}.ls2.gamma": np.ones(emb, np.float32),
            }
            sd.update(
                {
                    f"encoder.model.blocks.{i}." + k: v
                    for k, v in sd_np(b).items()
                }
            )
            sd.update(ls)
        sd["encoder.model.norm.weight"] = np.ones(emb, np.float32)
        sd["encoder.model.norm.bias"] = np.zeros(emb, np.float32)

        for name, ch in (("ray_dirs_encoder", 3), ("depth_encoder", 1)):
            m = TorchDenseRep(ch, 14, (588, 768, 1024), emb)
            sd.update({name + "." + k: v for k, v in sd_np(m).items()})
        for name, ch in (
            ("depth_scale_encoder", 1),
            ("cam_rot_encoder", 4),
            ("cam_trans_encoder", 3),
            ("cam_trans_scale_encoder", 1),
        ):
            m = TorchGlobalRep(ch, (128, 256, 512), emb)
            sd.update({name + "." + k: v for k, v in sd_np(m).items()})

        sd["fusion_norm_layer.weight"] = np.ones(emb, np.float32)
        sd["fusion_norm_layer.bias"] = np.zeros(emb, np.float32)
        sd["scale_token"] = np.zeros(emb, np.float32)

        trunk = TorchTrunk(emb, 256, 4, 4)
        sd.update({"info_sharing." + k: v for k, v in sd_np(trunk).items()})

        # DPT feature head at our small config's dims
        dim_is = 256
        # hook 0 consumes raw encoder features (reference model.py:369-371)
        feats = (emb, dim_is, dim_is, dim_is)
        layer_dims = (32, 48, 64, 96)
        fdim = 64
        dpt = {}
        resize_shapes = {
            0: ("convT", (layer_dims[0], layer_dims[0], 4, 4)),
            1: ("convT", (layer_dims[1], layer_dims[1], 2, 2)),
            3: ("conv", (layer_dims[3], layer_dims[3], 3, 3)),
        }
        for i in range(4):
            dpt[f"input_process.{i}.0.0.weight"] = np.random.randn(
                layer_dims[i], feats[i], 1, 1
            ).astype(np.float32)
            dpt[f"input_process.{i}.0.0.bias"] = np.zeros(
                layer_dims[i], np.float32
            )
            if i in resize_shapes:
                kind, shape = resize_shapes[i]
                dpt[f"input_process.{i}.0.1.weight"] = np.random.randn(
                    *shape
                ).astype(np.float32)
                dpt[f"input_process.{i}.0.1.bias"] = np.zeros(
                    shape[1] if kind == "convT" else shape[0], np.float32
                )
            dpt[f"input_process.{i}.1.weight"] = np.random.randn(
                fdim, layer_dims[i], 3, 3
            ).astype(np.float32)
        for k in range(1, 5):
            units = ("resConfUnit2",) if k == 4 else (
                "resConfUnit1",
                "resConfUnit2",
            )
            for unit in units:
                for c in ("conv1", "conv2"):
                    dpt[f"scratch.refinenet{k}.{unit}.{c}.weight"] = (
                        np.random.randn(fdim, fdim, 3, 3).astype(np.float32)
                    )
                    dpt[f"scratch.refinenet{k}.{unit}.{c}.bias"] = np.zeros(
                        fdim, np.float32
                    )
            dpt[f"scratch.refinenet{k}.out_conv.weight"] = np.random.randn(
                fdim, fdim, 1, 1
            ).astype(np.float32)
            dpt[f"scratch.refinenet{k}.out_conv.bias"] = np.zeros(
                fdim, np.float32
            )
        sd.update({"dpt_feature_head." + k: v for k, v in dpt.items()})

        reg = {
            "conv1.weight": np.random.randn(32, fdim, 3, 3).astype(np.float32),
            "conv1.bias": np.zeros(32, np.float32),
            "conv2.0.weight": np.random.randn(32, 32, 3, 3).astype(np.float32),
            "conv2.0.bias": np.zeros(32, np.float32),
            "conv2.2.weight": np.random.randn(6, 32, 1, 1).astype(np.float32),
            "conv2.2.bias": np.zeros(6, np.float32),
        }
        sd.update({"dpt_regressor_head." + k: v for k, v in reg.items()})

        ph = TorchPoseHead(dim_is, 14)
        sd.update({"pose_head." + k: v for k, v in sd_np(ph).items()})
        mh = TorchMLPHead(dim_is, 196, 1)
        sd.update({"scale_head." + k: v for k, v in sd_np(mh).items()})

        converted = convert_mapanything(sd)

        # init our model at the matching scale
        from mapanything_tpu.models.mapanything import (
            MapAnything,
            MapAnythingConfig,
            Views,
        )

        cfg = MapAnythingConfig.small(
            encoder_size="small",  # ViT-S: emb 384, depth 12
            info_sharing_dim=256,
            info_sharing_depth=4,
        )
        model = MapAnything(cfg)
        rng = np.random.RandomState(0)
        B, V, H, W = 1, 2, 28, 28
        dirs = rng.randn(B, V, H, W, 3).astype(np.float32)
        dirs[..., 2] = np.abs(dirs[..., 2]) + 0.5
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        quats = rng.randn(B, V, 4).astype(np.float32)
        quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
        views = Views(
            img=jnp.asarray(rng.rand(B, V, H, W, 3).astype(np.float32)),
            ray_directions=jnp.asarray(dirs),
            depth_along_ray=jnp.asarray(
                rng.uniform(1, 5, (B, V, H, W, 1)).astype(np.float32)
            ),
            camera_pose_quats=jnp.asarray(quats),
            camera_pose_trans=jnp.asarray(rng.randn(B, V, 3).astype(np.float32)),
            is_metric_scale=jnp.ones((B, V), bool),
        )
        target = jax.jit(model.init)(jax.random.PRNGKey(0), views)["params"]

        from mapanything_tpu.utils.torch_convert import verify_tree_shapes

        mismatches = verify_tree_shapes(converted, target)
        assert mismatches == [], mismatches[:10]


class TorchMoGeResBlock(tnn.Module):
    # reference moge models/v1.py:23 (group_norm variant)
    def __init__(self, dim):
        super().__init__()
        self.layers = tnn.Sequential(
            tnn.GroupNorm(1, dim),
            tnn.ReLU(),
            tnn.Conv2d(dim, dim, 3, 1, 1),
            tnn.GroupNorm(max(dim // 32, 1), dim),
            tnn.ReLU(),
            tnn.Conv2d(dim, dim, 3, 1, 1),
        )
        self.skip_connection = tnn.Identity()

    def forward(self, x):
        return self.layers(x) + self.skip_connection(x)


class TorchMoGeHead(tnn.Module):
    # reference moge models/v1.py:86 param layout
    def __init__(self, num_features, dim_in, dim_proj, dim_upsample, last_ch, dim_out):
        super().__init__()
        self.projects = tnn.ModuleList(
            [tnn.Conv2d(dim_in, dim_proj, 1) for _ in range(num_features)]
        )
        ups = []
        for cin, cout in zip([dim_proj] + dim_upsample[:-1], dim_upsample):
            ups.append(
                tnn.Sequential(
                    tnn.Sequential(
                        tnn.ConvTranspose2d(cin + 2, cout, 2, 2),
                        tnn.Conv2d(cout, cout, 3, 1, 1),
                    ),
                    TorchMoGeResBlock(cout),
                )
            )
        self.upsample_blocks = tnn.ModuleList(ups)
        self.output_block = tnn.ModuleList(
            [
                tnn.Sequential(
                    tnn.Conv2d(dim_upsample[-1] + 2, last_ch, 3, 1, 1),
                    tnn.ReLU(),
                    tnn.Conv2d(last_ch, d, 1),
                )
                for d in dim_out
            ]
        )


class TestMoGeConversion:
    def test_resblock_parity(self):
        from mapanything_tpu.models.external.moge import ResidualConvBlock
        from mapanything_tpu.utils.torch_convert import convert_moge

        torch.manual_seed(7)
        head = TorchMoGeHead(2, 16, 8, [8, 8], 4, [3, 1])
        sd = {"head." + k: v for k, v in sd_np(head).items()}
        # dummy backbone so convert_moge runs end to end
        sd.update(
            {
                "backbone.patch_embed.proj.weight": np.zeros(
                    (16, 3, 14, 14), np.float32
                ),
                "backbone.patch_embed.proj.bias": np.zeros(16, np.float32),
                "backbone.cls_token": np.zeros((1, 1, 16), np.float32),
                "backbone.pos_embed": np.zeros((1, 2, 16), np.float32),
                "backbone.norm.weight": np.ones(16, np.float32),
                "backbone.norm.bias": np.zeros(16, np.float32),
            }
        )
        params = convert_moge(sd)

        # residual block numerics
        tb = TorchMoGeResBlock(8).eval()
        tb.load_state_dict(
            {
                k[len("upsample_blocks.0.1."):]: torch.from_numpy(v)
                for k, v in sd_np(head).items()
                if k.startswith("upsample_blocks.0.1.")
            }
        )
        ours = ResidualConvBlock(8)
        x = np.random.RandomState(7).rand(1, 4, 4, 8).astype(np.float32)
        ref = (
            tb(torch.from_numpy(x).permute(0, 3, 1, 2))
            .permute(0, 2, 3, 1)
            .detach()
            .numpy()
        )
        got = np.asarray(
            ours.apply(
                {"params": params["head"]["up_res_0"]}, jnp.asarray(x)
            )
        )
        np.testing.assert_allclose(got, ref, atol=3e-4)

    def test_full_moge_tree_shapes(self):
        from mapanything_tpu.models.external.moge import MoGeConfig, MoGeModel
        from mapanything_tpu.utils.torch_convert import (
            convert_moge,
            verify_tree_shapes,
        )

        cfg = MoGeConfig.small()
        model = MoGeModel(cfg)
        x = jnp.asarray(
            np.random.RandomState(0).rand(1, 28, 28, 3).astype(np.float32)
        )
        target = jax.jit(model.init)(jax.random.PRNGKey(0), x)["params"]

        # torch state dict at the same scale
        torch.manual_seed(8)
        emb = target["head"]["project_0"]["kernel"].shape[2]
        n_proj = sum(1 for k in target["head"] if k.startswith("project_"))
        dim_proj = target["head"]["project_0"]["kernel"].shape[3]
        # flax ConvTranspose(transpose_kernel=True) kernels are
        # (kh, kw, out, in) — out_features is axis 2.
        ups = [
            target["head"][f"upsample_{i}"]["kernel"].shape[2]
            for i in range(
                sum(1 for k in target["head"] if k.startswith("upsample_"))
            )
        ]
        last_ch = target["head"]["out_conv_0"]["kernel"].shape[3]
        head = TorchMoGeHead(n_proj, emb, dim_proj, ups, last_ch, [3, 1])
        sd = {"head." + k: v for k, v in sd_np(head).items()}

        # DINOv2 backbone at the flax tree's scale
        depth = sum(1 for k in target["backbone"] if k.startswith("block_"))
        sd["backbone.patch_embed.proj.weight"] = np.zeros(
            (emb, 3, 14, 14), np.float32
        )
        sd["backbone.patch_embed.proj.bias"] = np.zeros(emb, np.float32)
        sd["backbone.cls_token"] = np.zeros((1, 1, emb), np.float32)
        sd["backbone.pos_embed"] = np.asarray(
            target["backbone"]["pos_embed"]
        )
        for i in range(depth):
            b = TorchBlock(emb, 4)
            sd.update(
                {f"backbone.blocks.{i}." + k: v for k, v in sd_np(b).items()}
            )
            if "ls1" in target["backbone"][f"block_{i}"]:
                sd[f"backbone.blocks.{i}.ls1.gamma"] = np.ones(emb, np.float32)
                sd[f"backbone.blocks.{i}.ls2.gamma"] = np.ones(emb, np.float32)
        sd["backbone.norm.weight"] = np.ones(emb, np.float32)
        sd["backbone.norm.bias"] = np.zeros(emb, np.float32)

        converted = convert_moge(sd)
        mismatches = verify_tree_shapes(converted, target)
        assert mismatches == [], mismatches[:10]
