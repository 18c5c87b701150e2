"""Numerical parity: torch DINOv2-style blocks vs our flax modules.

Validates both the weight-conversion rules (utils/torch_convert.py) and the
semantic parity of our ViT implementation with the reference encoder
structure (uniception/models/encoders/dinov2.py) — torch CPU vs flax CPU
on identical weights must agree to fp32 tolerance.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from mapanything_tpu.models.encoders.vit import ViTEncoder  # noqa: E402
from mapanything_tpu.utils.torch_convert import (  # noqa: E402
    convert_dinov2_vit,
    verify_tree_shapes,
)


class TorchDinoBlock(tnn.Module):
    """Minimal DINOv2 block: prenorm attn + LS, prenorm mlp + LS."""

    def __init__(self, dim, heads):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim, eps=1e-6)
        self.attn = tnn.Module()
        self.attn.qkv = tnn.Linear(dim, dim * 3)
        self.attn.proj = tnn.Linear(dim, dim)
        self.ls1 = tnn.Module()
        self.ls1.gamma = tnn.Parameter(torch.full((dim,), 1e-5))
        self.norm2 = tnn.LayerNorm(dim, eps=1e-6)
        self.mlp = tnn.Module()
        self.mlp.fc1 = tnn.Linear(dim, dim * 4)
        self.mlp.fc2 = tnn.Linear(dim * 4, dim)
        self.ls2 = tnn.Module()
        self.ls2.gamma = tnn.Parameter(torch.full((dim,), 1e-5))
        self.heads = heads

    def forward(self, x):
        b, n, c = x.shape
        h = self.heads
        y = self.norm1(x)
        qkv = self.attn.qkv(y).reshape(b, n, 3, h, c // h).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        y = torch.nn.functional.scaled_dot_product_attention(q, k, v)
        y = y.permute(0, 2, 1, 3).reshape(b, n, c)
        y = self.attn.proj(y)
        x = x + self.ls1.gamma * y
        y = self.norm2(x)
        y = self.mlp.fc2(torch.nn.functional.gelu(self.mlp.fc1(y)))
        return x + self.ls2.gamma * y


class TorchDinoViT(tnn.Module):
    def __init__(self, dim=64, heads=4, depth=2, patch=14, grid=4):
        super().__init__()
        self.patch_embed = tnn.Module()
        self.patch_embed.proj = tnn.Conv2d(3, dim, patch, stride=patch)
        self.cls_token = tnn.Parameter(torch.randn(1, 1, dim) * 0.02)
        self.pos_embed = tnn.Parameter(torch.randn(1, grid * grid + 1, dim) * 0.02)
        self.blocks = tnn.ModuleList(
            [TorchDinoBlock(dim, heads) for _ in range(depth)]
        )
        self.norm = tnn.LayerNorm(dim, eps=1e-6)
        self.patch = patch

    def forward(self, img):  # img (B, 3, H, W)
        x = self.patch_embed.proj(img)  # (B, C, h, w)
        b, c, h, w = x.shape
        x = x.flatten(2).transpose(1, 2)  # (B, N, C)
        x = x + self.pos_embed[:, 1:]
        cls = self.cls_token + self.pos_embed[:, :1]
        x = torch.cat([cls.expand(b, -1, -1), x], dim=1)
        for blk in self.blocks:
            x = blk(x)
        x = self.norm(x)
        return x[:, 1:].reshape(b, h, w, c)


def test_vit_torch_parity():
    torch.manual_seed(0)
    grid = 4
    tmodel = TorchDinoViT(dim=64, heads=4, depth=2, patch=14, grid=grid).eval()
    state = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}

    # Our flax ViT with matching architecture
    class TinyViT(ViTEncoder):
        pass

    fmodel = ViTEncoder(
        size="small",  # placeholder; we override params wholly
        patch_size=14,
        pos_embed_grid=grid,
        init_values=1e-5,
    )
    # Build flax params with the right shapes via a custom-size model:
    # easier: construct the converted tree and run apply directly.
    converted = convert_dinov2_vit(state)

    rng = np.random.RandomState(0)
    img = rng.randn(2, 56, 56, 3).astype(np.float32)

    # Initialize a flax ViT of identical geometry to get the params template.
    import flax.linen as nn
    from mapanything_tpu.models.blocks import SelfAttentionBlock

    class FlaxTinyViT(nn.Module):
        @nn.compact
        def __call__(self, images):
            B, H, W, _ = images.shape
            h = w = H // 14
            x = nn.Conv(64, (14, 14), strides=(14, 14), name="patch_embed")(images)
            x = x.reshape(B, h * w, 64)
            pos_embed = self.param(
                "pos_embed", nn.initializers.zeros, (1, grid * grid + 1, 64)
            )
            cls_token = self.param("cls_token", nn.initializers.zeros, (1, 1, 64))
            x = x + pos_embed[:, 1:]
            cls = jnp.broadcast_to(cls_token + pos_embed[:, :1], (B, 1, 64))
            x = jnp.concatenate([cls, x], axis=1)
            for i in range(2):
                x = SelfAttentionBlock(
                    dim=64, num_heads=4, qkv_bias=True, init_values=1e-5,
                    name=f"block_{i}",
                )(x)
            x = nn.LayerNorm(epsilon=1e-6, name="norm")(x)
            return x[:, 1:].reshape(B, h, w, 64)

    fvit = FlaxTinyViT()
    template = fvit.init(jax.random.PRNGKey(0), jnp.asarray(img))["params"]
    problems = verify_tree_shapes(converted, template)
    assert not problems, problems

    out_flax = fvit.apply({"params": converted}, jnp.asarray(img))
    with torch.no_grad():
        out_torch = tmodel(torch.from_numpy(img.transpose(0, 3, 1, 2)))

    np.testing.assert_allclose(
        np.asarray(out_flax), out_torch.numpy(), atol=2e-5,
        err_msg="flax ViT does not match torch reference on identical weights",
    )


if __name__ == "__main__":
    pytest.main([__file__, "-q", "-x"])
