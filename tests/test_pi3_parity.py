"""Pi3 converter parity against the ACTUAL vendored upstream code.

Numeric checks run the reference's real modules
(mapanything/models/external/pi3/layers/*) at tiny dims; the full-tree
check instantiates the reference Pi3 on torch's meta device (flagship
shape, no weights materialized) and asserts convert_pi3 produces exactly
our model's init-tree shapes.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from reference_shims import install_reference_path, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference repo not present"
)

install_reference_path()


def sd_np(mod):
    return {k: v.detach().numpy() for k, v in mod.state_dict().items()}


def to_t(x):
    return torch.from_numpy(np.asarray(x))


class TestRoPE2DParity:
    def test_rope_matches_reference(self):
        from mapanything.models.external.pi3.layers.pos_embed import (
            PositionGetter,
            RoPE2D,
        )

        from mapanything_tpu.ops.rope import make_rope2d, patch_position_grid

        B, H, D, h, w = 1, 2, 16, 3, 4
        rng = np.random.RandomState(0)
        q = rng.randn(B, h * w, H, D).astype(np.float32)

        rope_t = RoPE2D(freq=100.0)
        pos_t = PositionGetter()(B, h, w, torch.device("cpu"))
        # reference layout (B, H, N, D)
        out_t = rope_t(to_t(q).permute(0, 2, 1, 3), pos_t)
        want = out_t.permute(0, 2, 1, 3).numpy()

        rope_j = make_rope2d(100.0)
        pos_j = patch_position_grid(B, h, w)
        got = np.asarray(rope_j(jnp.asarray(q), pos_j))
        np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


class TestBlockRopeParity:
    def test_block_matches_reference(self):
        from functools import partial

        import torch.nn as tnn

        from mapanything.models.external.dinov2.layers import Mlp
        from mapanything.models.external.pi3.layers.attention import (
            FlashAttentionRope,
        )
        from mapanything.models.external.pi3.layers.block import BlockRope
        from mapanything.models.external.pi3.layers.pos_embed import (
            PositionGetter,
            RoPE2D,
        )

        from mapanything_tpu.models.blocks import SelfAttentionBlock
        from mapanything_tpu.ops.rope import make_rope2d, patch_position_grid
        from mapanything_tpu.utils.torch_convert import _convert_vit_block

        torch.manual_seed(0)
        dim, heads, h, w = 32, 4, 2, 3
        blk = BlockRope(
            dim=dim, num_heads=heads, mlp_ratio=4, qkv_bias=True,
            proj_bias=True, ffn_bias=True,
            norm_layer=partial(tnn.LayerNorm, eps=1e-6), act_layer=tnn.GELU,
            ffn_layer=Mlp, init_values=0.01, qk_norm=True,
            attn_class=FlashAttentionRope, rope=RoPE2D(freq=100.0),
        ).eval()

        sd = {"b." + k: v for k, v in sd_np(blk).items()}
        tree = _convert_vit_block({k: np.asarray(v) for k, v in sd.items()}, "b.")

        rng = np.random.RandomState(1)
        x = rng.randn(1, h * w, dim).astype(np.float32)
        pos_t = PositionGetter()(1, h, w, torch.device("cpu"))
        with torch.no_grad():
            want = blk(to_t(x), xpos=pos_t).numpy()

        ours = SelfAttentionBlock(
            dim=dim, num_heads=heads, qkv_bias=True, qk_norm=True,
            init_values=0.01, rope=make_rope2d(100.0),
        )
        got = np.asarray(
            ours.apply({"params": tree}, jnp.asarray(x), patch_position_grid(1, h, w))
        )
        np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-4)


class TestPi3HeadsParity:
    def test_camera_head_mlp_path(self):
        """CameraHead linear path (pre-SVD outputs compared via fc_t and
        the full 4x4 pose; SVD orthogonalization compared loosely)."""
        from mapanything.models.external.pi3.layers.camera_head import (
            CameraHead,
        )

        from mapanything_tpu.models.external.pi3 import Pi3CameraHead, Pi3Config
        from mapanything_tpu.utils.torch_convert import linear

        torch.manual_seed(2)
        d = 32
        ref = CameraHead(dim=d).eval()
        sd = {"camera_head." + k: v for k, v in sd_np(ref).items()}

        cam = {}
        for i in range(2):
            for j in (1, 2, 3):
                cam[f"res{i}_{j}"] = linear(
                    sd[f"camera_head.res_conv.{i}.res_conv{j}.weight"],
                    sd[f"camera_head.res_conv.{i}.res_conv{j}.bias"],
                )
        cam["mlp1"] = linear(sd["camera_head.more_mlps.0.weight"],
                             sd["camera_head.more_mlps.0.bias"])
        cam["mlp2"] = linear(sd["camera_head.more_mlps.2.weight"],
                             sd["camera_head.more_mlps.2.bias"])
        cam["fc_t"] = linear(sd["camera_head.fc_t.weight"],
                             sd["camera_head.fc_t.bias"])
        cam["fc_rot"] = linear(sd["camera_head.fc_rot.weight"],
                               sd["camera_head.fc_rot.bias"])

        rng = np.random.RandomState(3)
        h, w = 2, 3
        feat = rng.randn(2, h * w, d).astype(np.float32)
        with torch.no_grad():
            want = ref(to_t(feat), h, w).numpy()  # (B, 4, 4)

        import dataclasses

        ours = Pi3CameraHead(
            dataclasses.replace(Pi3Config.small(), camera_head_dim=d)
        )
        got = np.asarray(ours.apply({"params": cam}, jnp.asarray(feat)))
        # rotation via SVD: both sides orthogonal; compare pose entries
        np.testing.assert_allclose(got[:, :3, 3], want[:, :3, 3], atol=2e-5)
        np.testing.assert_allclose(got, want, atol=1e-3)

    def test_linear_pts3d_unpatchify(self):
        from mapanything.models.external.pi3.layers.transformer_head import (
            LinearPts3d,
        )

        from mapanything_tpu.models.heads.pose import LinearFeature

        torch.manual_seed(3)
        p, c, out = 4, 16, 3
        ref = LinearPts3d(patch_size=p, dec_embed_dim=c, output_dim=out).eval()
        rng = np.random.RandomState(4)
        h, w = 2, 3
        tok = rng.randn(1, h * w, c).astype(np.float32)
        with torch.no_grad():
            want = ref([to_t(tok)], (h * p, w * p)).numpy()

        kern = ref.proj.weight.detach().numpy().T[None, None]
        bias = ref.proj.bias.detach().numpy()
        ours = LinearFeature(out, p)
        got = np.asarray(
            ours.apply(
                {"params": {"linear": {"kernel": kern, "bias": bias}}},
                jnp.asarray(tok.reshape(1, h, w, c)),
            )
        )
        np.testing.assert_allclose(got, want, atol=2e-5)


class TestPi3FullTreeShapes:
    def test_flagship_tree_matches(self):
        """Reference Pi3 on the meta device (flagship shape) -> zero-filled
        state dict -> convert_pi3 covers our flagship init tree exactly."""
        from mapanything.models.external.pi3.models.pi3 import Pi3 as RefPi3

        from mapanything_tpu.models.external.pi3 import Pi3, Pi3Config
        from mapanything_tpu.utils.torch_convert import (
            convert_pi3,
            verify_tree_shapes,
        )

        # meta-device init: dinov2's __init__ calls
        # torch.linspace(...).item() (vision_transformer.py:144), which is
        # illegal on meta tensors — pin linspace to CPU during construction.
        orig_linspace = torch.linspace

        def cpu_linspace(*a, **k):
            k["device"] = "cpu"
            return orig_linspace(*a, **k)

        torch.linspace = cpu_linspace
        try:
            with torch.device("meta"):
                ref = RefPi3(pos_type="rope100", decoder_size="large")
        finally:
            torch.linspace = orig_linspace
        sd = {k: np.zeros(tuple(v.shape), np.float32)
              for k, v in ref.state_dict().items()}
        converted = convert_pi3(sd)

        cfg = Pi3Config()  # flagship: ViT-L+reg encoder, 36-layer dim-1024
        model = Pi3(cfg)
        imgs = jax.ShapeDtypeStruct((1, 2, 28, 28, 3), jnp.float32)
        target = jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0), jnp.zeros(imgs.shape))
        )["params"]
        mismatches = verify_tree_shapes(converted, target)
        assert mismatches == [], mismatches[:10]
