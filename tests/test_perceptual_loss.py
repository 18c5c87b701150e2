"""[FORK] VGG19 perceptual loss (reference losses.py:467-532, 849-900).

torchvision is not installed in this image, so the parity reference is a
torch Sequential built from the *public* VGG-19 configuration "E" with
torchvision's exact ``features.{i}`` naming (conv indices
0,2,5,7,10,12,14,16,19,21,23,25,28,30,32), max-pools swapped for
2x2 avg-pools exactly as ``PerceptualLoss._build_vgg`` does. The
converter therefore targets real torchvision ``vgg19`` checkpoints.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn

import jax
import jax.numpy as jnp

from mapanything_tpu.models.perceptual import (
    FEATURE_TAPS,
    PERCEPTUAL_LEVEL_WEIGHTS,
    VGG19_CONV_INDICES,
    VGG19_LAYOUT,
    VGG19Features,
    perceptual_distance,
)
from mapanything_tpu.train.losses import rgb_perception_loss
from mapanything_tpu.utils.torch_convert import convert_vgg19_features

VGG_MEAN = torch.tensor([123.680, 116.779, 103.939]).view(1, 3, 1, 1)


def build_torch_vgg19_features():
    """VGG19 conv tower with torchvision ``features`` indexing, avg-pool
    variant (losses.py:478-484), truncated after the last tap (idx 32)."""
    layers = []
    in_ch = 3
    for entry in VGG19_LAYOUT:
        if entry == "M":
            layers.append(tnn.AvgPool2d(kernel_size=2, stride=2))
        else:
            layers.append(tnn.Conv2d(in_ch, entry, 3, padding=1))
            layers.append(tnn.ReLU(inplace=False))
            in_ch = entry
        if len(layers) >= FEATURE_TAPS[-1]:
            break
    return tnn.Sequential(*layers[: FEATURE_TAPS[-1]])


def torch_taps(feats, images01):
    """Reference PerceptualLoss forward: preprocessed pixels + 5 taps."""
    x = images01 * 255.0 - VGG_MEAN
    taps = [x]
    start = 0
    for end in FEATURE_TAPS:
        for layer in list(feats.children())[start:end]:
            x = layer(x)
        taps.append(x)
        start = end
    return taps


class TestVGG19Converter:
    def test_layout_indices(self):
        # torchvision VGG-19 conv positions (public, fixed).
        assert VGG19_CONV_INDICES == (
            0, 2, 5, 7, 10, 12, 14, 16, 19, 21, 23, 25, 28, 30,
        )

    def test_feature_parity(self):
        torch.manual_seed(0)
        feats = build_torch_vgg19_features().eval()
        sd = {f"features.{k}": v.detach().numpy()
              for k, v in feats.state_dict().items()}
        # classifier keys must be ignored
        sd["classifier.0.weight"] = np.zeros((2, 2), np.float32)

        img = torch.rand(2, 3, 32, 48)
        with torch.no_grad():
            t_taps = torch_taps(feats, img)

        params = {"params": convert_vgg19_features(sd)}
        net = VGG19Features()
        j_taps = net.apply(params, jnp.asarray(img.permute(0, 2, 3, 1).numpy()))
        assert len(j_taps) == len(t_taps) == 6
        for i, (tt, jt) in enumerate(zip(t_taps, j_taps)):
            ref = tt.permute(0, 2, 3, 1).numpy()
            np.testing.assert_allclose(
                np.asarray(jt), ref, rtol=1e-4, atol=1e-4,
                err_msg=f"tap {i}",
            )

    def test_perceptual_distance_parity(self):
        torch.manual_seed(1)
        feats = build_torch_vgg19_features().eval()
        sd = {f"features.{k}": v.detach().numpy()
              for k, v in feats.state_dict().items()}
        a = torch.rand(2, 3, 32, 32)
        b = torch.rand(2, 3, 32, 32)
        with torch.no_grad():
            ta, tb = torch_taps(feats, a), torch_taps(feats, b)
            # reference e0..e5 weighting (losses.py:519-526)
            ref = sum(
                w * (x - y).abs().mean(dim=[1, 2, 3])
                for w, x, y in zip(PERCEPTUAL_LEVEL_WEIGHTS, ta, tb)
            ) / 255.0

        params = {"params": convert_vgg19_features(sd)}
        net = VGG19Features()
        to_j = lambda t: jnp.asarray(t.permute(0, 2, 3, 1).numpy())
        d = perceptual_distance(
            net.apply(params, to_j(a)), net.apply(params, to_j(b))
        )
        np.testing.assert_allclose(np.asarray(d), ref.numpy(), rtol=1e-4,
                                   atol=1e-5)


class TestRGBPerceptionLoss:
    def _params(self, rng=0):
        net = VGG19Features()
        return net.init(jax.random.PRNGKey(rng), jnp.zeros((1, 32, 32, 3)))

    def test_zero_on_identical(self):
        p = self._params()
        a = jax.random.uniform(jax.random.PRNGKey(1), (1, 2, 32, 32, 3))
        tot, det = rgb_perception_loss(p, a, a)
        assert float(tot) == pytest.approx(0.0, abs=1e-6)
        assert "rgb_perception" in det

    def test_positive_and_mask_scales(self):
        p = self._params()
        a = jax.random.uniform(jax.random.PRNGKey(1), (1, 2, 32, 32, 3))
        b = jax.random.uniform(jax.random.PRNGKey(2), (1, 2, 32, 32, 3))
        full, _ = rgb_perception_loss(p, a, b)
        assert float(full) > 0
        # half-valid mask halves the loss (reference mask semantics:
        # multiply by the sample's valid fraction, losses.py:527-530)
        mask = jnp.concatenate(
            [jnp.ones((1, 2, 16, 32)), jnp.zeros((1, 2, 16, 32))], axis=2
        ).astype(bool)
        half, _ = rgb_perception_loss(p, a, b, valid=mask)
        np.testing.assert_allclose(float(half), 0.5 * float(full), rtol=1e-5)

    def test_jit_and_grad(self):
        p = self._params()
        a = jax.random.uniform(jax.random.PRNGKey(1), (1, 1, 32, 32, 3))
        b = jax.random.uniform(jax.random.PRNGKey(2), (1, 1, 32, 32, 3))
        f = jax.jit(lambda x: rgb_perception_loss(p, x, b)[0])
        g = jax.grad(lambda x: rgb_perception_loss(p, x, b)[0])(a)
        assert np.isfinite(float(f(a)))
        assert np.all(np.isfinite(np.asarray(g)))
