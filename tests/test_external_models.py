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


class TestVGGTConversion:
    """convert_vggt rules vs inline torch replicas of upstream modules."""

    def _torch_qknorm_block(self, dim, heads):
        torch = pytest.importorskip("torch")
        import torch.nn as tnn

        class Block(tnn.Module):
            def __init__(self):
                super().__init__()
                hd = dim // heads
                self.norm1 = tnn.LayerNorm(dim, eps=1e-6)
                self.attn = tnn.Module()
                self.attn.qkv = tnn.Linear(dim, dim * 3)
                self.attn.proj = tnn.Linear(dim, dim)
                self.attn.q_norm = tnn.LayerNorm(hd)
                self.attn.k_norm = tnn.LayerNorm(hd)
                self.ls1 = tnn.Module()
                self.ls1.gamma = tnn.Parameter(torch.full((dim,), 0.01))
                self.norm2 = tnn.LayerNorm(dim, eps=1e-6)
                self.mlp = tnn.Module()
                self.mlp.fc1 = tnn.Linear(dim, dim * 4)
                self.mlp.fc2 = tnn.Linear(dim * 4, dim)
                self.ls2 = tnn.Module()
                self.ls2.gamma = tnn.Parameter(torch.full((dim,), 0.01))

            def forward(self, x):
                b, n, c = x.shape
                y = self.norm1(x)
                qkv = (
                    self.attn.qkv(y)
                    .reshape(b, n, 3, heads, c // heads)
                    .permute(2, 0, 3, 1, 4)
                )
                q, k, v = qkv[0], qkv[1], qkv[2]
                q, k = self.attn.q_norm(q), self.attn.k_norm(k)
                y = torch.nn.functional.scaled_dot_product_attention(q, k, v)
                y = y.permute(0, 2, 1, 3).reshape(b, n, c)
                x = x + self.ls1.gamma * self.attn.proj(y)
                y = self.norm2(x)
                y = self.mlp.fc2(torch.nn.functional.gelu(self.mlp.fc1(y)))
                return x + self.ls2.gamma * y

        return Block()

    def test_qknorm_block_parity(self):
        torch = pytest.importorskip("torch")
        from mapanything_tpu.models.blocks import SelfAttentionBlock
        from mapanything_tpu.utils.torch_convert import _convert_vit_block

        dim, heads = 32, 4
        tblock = self._torch_qknorm_block(dim, heads)
        sd = {
            "b.0." + k: v.detach().numpy()
            for k, v in tblock.state_dict().items()
        }
        params = _convert_vit_block(sd, "b.0.")

        x = np.random.RandomState(0).randn(2, 9, dim).astype(np.float32)
        with torch.no_grad():
            ref = tblock(torch.from_numpy(x)).numpy()

        fblock = SelfAttentionBlock(
            dim=dim, num_heads=heads, qkv_bias=True, qk_norm=True,
            init_values=0.01,
        )
        out = fblock.apply({"params": params}, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)

    def test_convert_vggt_full_tree(self):
        """Synthetic VGGT-1B-style state dict converts into a tree that
        loads into our small VGGT (aggregator + camera head subtrees)."""
        torch = pytest.importorskip("torch")
        from mapanything_tpu.utils.torch_convert import (
            convert_vggt,
            verify_tree_shapes,
        )

        cfg = VGGTConfig.small()
        wrapper = VGGTWrapper(cfg)
        images = jnp.zeros((1, 2, 28, 28, 3))
        target = jax.jit(wrapper.init)(jax.random.PRNGKey(0), images)["params"]

        dim, heads, hd = cfg.embed_dim, cfg.num_heads, cfg.embed_dim // cfg.num_heads
        sd = {}
        sd["aggregator.camera_token"] = np.zeros((1, 2, 1, dim), np.float32)
        sd["aggregator.register_token"] = np.zeros(
            (1, 2, cfg.num_register_tokens, dim), np.float32
        )
        sd["aggregator.patch_embed.proj.weight"] = np.zeros(
            (dim, 3, 14, 14), np.float32
        )
        sd["aggregator.patch_embed.proj.bias"] = np.zeros((dim,), np.float32)

        def block_sd(prefix, d, h):
            hdim = d // h
            out = {
                f"{prefix}norm1.weight": np.ones((d,), np.float32),
                f"{prefix}norm1.bias": np.zeros((d,), np.float32),
                f"{prefix}norm2.weight": np.ones((d,), np.float32),
                f"{prefix}norm2.bias": np.zeros((d,), np.float32),
                f"{prefix}attn.qkv.weight": np.zeros((3 * d, d), np.float32),
                f"{prefix}attn.qkv.bias": np.zeros((3 * d,), np.float32),
                f"{prefix}attn.proj.weight": np.zeros((d, d), np.float32),
                f"{prefix}attn.proj.bias": np.zeros((d,), np.float32),
                f"{prefix}attn.q_norm.weight": np.ones((hdim,), np.float32),
                f"{prefix}attn.q_norm.bias": np.zeros((hdim,), np.float32),
                f"{prefix}attn.k_norm.weight": np.ones((hdim,), np.float32),
                f"{prefix}attn.k_norm.bias": np.zeros((hdim,), np.float32),
                f"{prefix}ls1.gamma": np.full((d,), 0.01, np.float32),
                f"{prefix}ls2.gamma": np.full((d,), 0.01, np.float32),
                f"{prefix}mlp.fc1.weight": np.zeros((4 * d, d), np.float32),
                f"{prefix}mlp.fc1.bias": np.zeros((4 * d,), np.float32),
                f"{prefix}mlp.fc2.weight": np.zeros((d, 4 * d), np.float32),
                f"{prefix}mlp.fc2.bias": np.zeros((d,), np.float32),
            }
            return out

        for i in range(cfg.depth):
            sd.update(block_sd(f"aggregator.frame_blocks.{i}.", dim, heads))
            sd.update(block_sd(f"aggregator.global_blocks.{i}.", dim, heads))

        d2 = 2 * dim
        sd["camera_head.token_norm.weight"] = np.ones((d2,), np.float32)
        sd["camera_head.token_norm.bias"] = np.zeros((d2,), np.float32)
        sd["camera_head.trunk_norm.weight"] = np.ones((d2,), np.float32)
        sd["camera_head.trunk_norm.bias"] = np.zeros((d2,), np.float32)
        sd["camera_head.empty_pose_tokens"] = np.zeros((1, 1, 9), np.float32)
        sd["camera_head.embed_pose.weight"] = np.zeros((d2, 9), np.float32)
        sd["camera_head.embed_pose.bias"] = np.zeros((d2,), np.float32)
        sd["camera_head.poseLN_modulation.1.weight"] = np.zeros(
            (3 * d2, d2), np.float32
        )
        sd["camera_head.poseLN_modulation.1.bias"] = np.zeros(
            (3 * d2,), np.float32
        )
        for i in range(cfg.camera_trunk_depth):
            sd.update(block_sd(f"camera_head.trunk.{i}.", d2, heads))
        sd["camera_head.pose_branch.fc1.weight"] = np.zeros(
            (d2 // 2, d2), np.float32
        )
        sd["camera_head.pose_branch.fc1.bias"] = np.zeros((d2 // 2,), np.float32)
        sd["camera_head.pose_branch.fc2.weight"] = np.zeros((9, d2 // 2), np.float32)
        sd["camera_head.pose_branch.fc2.bias"] = np.zeros((9,), np.float32)

        converted = convert_vggt(sd)
        problems = verify_tree_shapes(
            converted["aggregator"], target["aggregator"]
        )
        assert not problems, problems
        problems = verify_tree_shapes(
            converted["camera_head"], target["camera_head"]
        )
        assert not problems, problems


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

    def test_haar_matches_reference_scaling(self):
        from mapanything_tpu.models.encoders.cosmos import haar_downsample

        x = jnp.asarray(np.random.RandomState(0).randn(1, 8, 8, 2), jnp.float32)
        y = haar_downsample(x)
        assert y.shape == (1, 4, 4, 8)
        # The reference Patcher._dwt uses rescale=True: the LL band is the
        # 2x2 AVERAGE (g^2/2 scaling; bit-matched in
        # test_external_converters.py against the vendored Patcher), so the
        # transform scales energy by 1/4 rather than preserving it.
        ll = y[..., :2]
        want_avg = 0.25 * (
            x[:, 0::2, 0::2] + x[:, 0::2, 1::2]
            + x[:, 1::2, 0::2] + x[:, 1::2, 1::2]
        )
        np.testing.assert_allclose(np.asarray(ll), np.asarray(want_avg), atol=1e-6)
        np.testing.assert_allclose(
            float(jnp.sum(y**2)), float(jnp.sum(x**2)) / 4.0, rtol=1e-5
        )


class TestPi3:
    def test_forward_shapes_and_pose_validity(self):
        from mapanything_tpu.models.external.pi3 import Pi3Config, Pi3Wrapper

        w = Pi3Wrapper(Pi3Config.small())
        imgs = jnp.asarray(
            np.random.RandomState(0).rand(1, 2, 28, 28, 3).astype(np.float32)
        )
        params = jax.jit(w.init)(jax.random.PRNGKey(0), imgs)
        res = w.apply(params, imgs)
        assert len(res) == 2
        assert res[0]["pts3d"].shape == (1, 28, 28, 3)
        assert res[0]["cam_quats"].shape == (1, 4)
        # rays are unit, depth positive
        norms = np.linalg.norm(np.asarray(res[0]["ray_directions"]), axis=-1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-5)
        assert (np.asarray(res[0]["depth_along_ray"]) > 0).all()
        # camera rotations are exactly orthonormal (SVD + Newton-Schulz)
        out = w.model.apply(params, imgs)
        R = np.asarray(out["camera_poses"])[0, :, :3, :3]
        for r in R:
            np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-5)
            assert np.linalg.det(r) > 0.99
        # global points == pose-transformed local points
        lp = np.asarray(out["local_points"])[0, 0]
        pose = np.asarray(out["camera_poses"])[0, 0]
        expect = lp @ pose[:3, :3].T + pose[:3, 3]
        np.testing.assert_allclose(
            np.asarray(out["points"])[0, 0], expect, atol=1e-4
        )

    def test_registry(self):
        w = init_model("pi3", size="small")
        assert w.cfg.patch_embed == "conv"


class TestAnyCalib:
    def test_expmap_roundtrip(self):
        from mapanything_tpu.models.external.anycalib import (
            expmap_to_rays,
            rays_to_tangent,
        )

        t = jnp.asarray(
            np.random.RandomState(0).randn(32, 2).astype(np.float32) * 0.5
        )
        r = expmap_to_rays(t)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(r), axis=-1), 1.0, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(rays_to_tangent(r)), np.asarray(t), atol=1e-5
        )

    def test_pinhole_fit_recovers_gt(self):
        from mapanything_tpu.geometry.camera import rays_in_camera_frame
        from mapanything_tpu.models.external.anycalib import (
            fit_pinhole_from_rays,
        )

        K = jnp.asarray([[[200.0, 0, 112], [0, 220.0, 112], [0, 0, 1]]])
        _, rays = rays_in_camera_frame(
            K, 224, 224, normalize_to_unit_sphere=True
        )
        Kf = fit_pinhole_from_rays(rays, (224, 224))
        np.testing.assert_allclose(np.asarray(Kf), np.asarray(K), atol=0.5)

    def test_forward_and_registry(self):
        w = init_model("anycalib", size="small")
        imgs = jnp.asarray(
            np.random.RandomState(1).rand(2, 28, 28, 3).astype(np.float32)
        )
        params = jax.jit(w.init)(jax.random.PRNGKey(0), imgs)
        res = w.apply(params, imgs)
        assert len(res) == 1
        assert res[0]["ray_directions"].shape == (2, 28, 28, 3)
        assert res[0]["intrinsics"].shape == (2, 3, 3)
        norms = np.linalg.norm(np.asarray(res[0]["ray_directions"]), axis=-1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-5)


class TestGlobalAlignment:
    def _make_synthetic(self, V=3, H=16, W=16, seed=0, noise=0.0):
        from mapanything_tpu.ba.global_alignment import (
            PairGraph,
            make_complete_pairs,
        )
        from mapanything_tpu.geometry.camera import depthmap_to_camera_frame

        rng = np.random.RandomState(seed)
        f = 20.0
        K = np.array(
            [[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32
        )

        def rotz(a):
            c, s = np.cos(a), np.sin(a)
            return np.array(
                [[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32
            )

        c2w = []
        for v in range(V):
            T = np.eye(4, dtype=np.float32)
            T[:3, :3] = rotz(0.1 * v)
            T[:3, 3] = [0.3 * v, 0.1 * v, 0.05 * v]
            c2w.append(T)
        c2w = np.stack(c2w)
        depth = 2.0 + 0.5 * rng.rand(V, H, W).astype(np.float32)
        pts_world = []
        for v in range(V):
            pc, _ = depthmap_to_camera_frame(
                jnp.asarray(depth[v][None]), jnp.asarray(K[None])
            )
            pc = np.asarray(pc[0])
            pts_world.append(pc @ c2w[v][:3, :3].T + c2w[v][:3, 3])
        pts_world = np.stack(pts_world)

        edges = make_complete_pairs(V)
        w2c = np.linalg.inv(c2w)
        pts_i, pts_j, conf_i, conf_j = [], [], [], []
        for i, j in edges:
            s_e = np.exp(rng.randn() * 0.1)  # per-edge scale ambiguity
            Xi = (pts_world[i] @ w2c[i][:3, :3].T + w2c[i][:3, 3]) * s_e
            Xj = (pts_world[j] @ w2c[i][:3, :3].T + w2c[i][:3, 3]) * s_e
            if noise:
                Xi = Xi + rng.randn(*Xi.shape).astype(np.float32) * noise
                Xj = Xj + rng.randn(*Xj.shape).astype(np.float32) * noise
            pts_i.append(Xi)
            pts_j.append(Xj)
            conf_i.append(np.full((H, W), 3.0, np.float32))
            conf_j.append(np.full((H, W), 3.0, np.float32))
        graph = PairGraph(
            V,
            edges,
            np.stack(pts_i),
            np.stack(pts_j),
            np.stack(conf_i),
            np.stack(conf_j),
        )
        return graph, c2w, w2c, depth, f

    def test_recovers_gt_up_to_gauge(self):
        from mapanything_tpu.ba.global_alignment import global_align
        from mapanything_tpu.utils.metrics import rotation_angle_deg

        graph, c2w, w2c, depth, f = self._make_synthetic()
        scene = global_align(graph, niter=300, lr=0.01)
        assert scene.loss < 0.01
        # focal within 5%
        np.testing.assert_allclose(scene.focals, f, rtol=0.05)
        # relative rotations within 1 degree
        for v in range(1, graph.num_views):
            Rg = w2c[v][:3, :3] @ c2w[0][:3, :3]
            Rp = (
                np.linalg.inv(scene.cam2world[v])[:3, :3]
                @ scene.cam2world[0][:3, :3]
            )
            assert rotation_angle_deg(Rg[None], Rp[None])[0] < 1.0
        # depth consistent up to one global scale (spread < 5%)
        r = scene.depthmaps / depth
        assert float(r.std() / r.mean()) < 0.05

    def test_umeyama_exact(self):
        from mapanything_tpu.ba.global_alignment import weighted_umeyama

        rng = np.random.RandomState(3)
        src = rng.randn(100, 3).astype(np.float32)
        ang = 0.3
        R_gt = np.array(
            [
                [np.cos(ang), -np.sin(ang), 0],
                [np.sin(ang), np.cos(ang), 0],
                [0, 0, 1],
            ],
            np.float32,
        )
        s_gt, t_gt = 1.7, np.array([0.2, -0.5, 1.0], np.float32)
        dst = s_gt * src @ R_gt.T + t_gt
        w = np.abs(rng.rand(100)).astype(np.float32) + 0.1
        s, R, t = weighted_umeyama(
            jnp.asarray(src), jnp.asarray(dst), jnp.asarray(w)
        )
        np.testing.assert_allclose(float(s), s_gt, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(R), R_gt, atol=1e-4)
        np.testing.assert_allclose(np.asarray(t), t_gt, atol=1e-3)


class TestDUSt3RBA:
    def test_end_to_end_small(self):
        w = init_model("dust3r_ba", size="small", global_optim_niter=10)
        imgs = jnp.asarray(
            np.random.RandomState(0).rand(1, 3, 32, 32, 3).astype(np.float32)
        )
        params = w.init(jax.random.PRNGKey(0), imgs)
        res = w.apply(params, imgs)
        assert len(res) == 3
        for r in res:
            assert r["pts3d"].shape == (1, 32, 32, 3)
            for v in r.values():
                assert np.isfinite(np.asarray(v)).all()


class TestPow3R:
    def test_priors_change_output(self):
        from mapanything_tpu.models.external.pow3r import (
            Pow3RConfig,
            Pow3RWrapper,
        )

        rng = np.random.RandomState(0)
        w = Pow3RWrapper(Pow3RConfig.small())
        imgs = jnp.asarray(rng.rand(1, 2, 32, 32, 3).astype(np.float32))
        K = jnp.asarray(
            np.tile(
                np.array(
                    [[40.0, 0, 16], [0, 40.0, 16], [0, 0, 1]], np.float32
                ),
                (1, 2, 1, 1),
            )
        )
        D = jnp.asarray(rng.uniform(1, 3, (1, 2, 32, 32)).astype(np.float32))
        params = w.init(
            jax.random.PRNGKey(0),
            imgs,
            rays=jnp.zeros((1, 2, 32, 32, 3), jnp.float32),
            depth_prior=jnp.zeros((1, 2, 32, 32, 2), jnp.float32),
            relpose=jnp.asarray(np.eye(4, dtype=np.float32)[None]),
        )
        res_no = w.apply(params, imgs)
        res_k = w.apply(params, imgs, intrinsics=K)
        res_kd = w.apply(params, imgs, intrinsics=K, depthmaps=D)
        for r in (res_no, res_k, res_kd):
            assert all(np.isfinite(np.asarray(v)).all() for v in r[0].values())
        # priors must actually condition the prediction
        assert not np.allclose(
            np.asarray(res_no[0]["pts3d"]), np.asarray(res_k[0]["pts3d"])
        )
        assert not np.allclose(
            np.asarray(res_k[0]["pts3d"]), np.asarray(res_kd[0]["pts3d"])
        )

    def test_relpose_prior_helpers(self):
        from mapanything_tpu.models.external.pow3r import (
            poses_to_relpose_prior,
        )

        c2w1 = jnp.asarray(np.eye(4, dtype=np.float32)[None])
        T2 = np.eye(4, dtype=np.float32)
        T2[:3, 3] = [3.0, 0, 0]
        rel = poses_to_relpose_prior(c2w1, jnp.asarray(T2[None]))
        np.testing.assert_allclose(
            np.asarray(rel[0, :3, 3]), [1.0, 0, 0], atol=1e-6
        )  # unit-norm translation
        np.testing.assert_allclose(
            np.asarray(rel[0, :3, :3]), np.eye(3), atol=1e-6
        )

    def test_ba_registry(self):
        w = init_model("pow3r_ba", size="small", global_optim_niter=5)
        imgs = jnp.asarray(
            np.random.RandomState(0).rand(1, 3, 32, 32, 3).astype(np.float32)
        )
        params = w.init(jax.random.PRNGKey(0), imgs)
        res = w.apply(params, imgs)
        assert len(res) == 3
        assert all(
            np.isfinite(np.asarray(v)).all() for r in res for v in r.values()
        )


class TestMUSt3R:
    def test_forward_and_memory(self):
        from mapanything_tpu.models.external.must3r import (
            MUSt3RConfig,
            MUSt3RWrapper,
        )

        w = MUSt3RWrapper(MUSt3RConfig.small())
        imgs = jnp.asarray(
            np.random.RandomState(0).rand(1, 4, 32, 32, 3).astype(np.float32)
        )
        params = jax.jit(w.init)(jax.random.PRNGKey(0), imgs)
        res = w.apply(params, imgs)
        assert len(res) == 4
        assert all(
            np.isfinite(np.asarray(v)).all() for r in res for v in r.values()
        )
        # later views must depend on earlier views through the memory
        imgs2 = np.asarray(imgs).copy()
        imgs2[0, 0] += 0.5  # perturb view 0
        res2 = w.apply(params, jnp.asarray(imgs2))
        assert not np.allclose(
            np.asarray(res[3]["pts3d"]), np.asarray(res2[3]["pts3d"])
        )

    def test_focal_recovery(self):
        from mapanything_tpu.geometry.camera import depthmap_to_camera_frame
        from mapanything_tpu.models.external.must3r import recover_focal

        K = jnp.asarray([[[40.0, 0, 16], [0, 40.0, 16], [0, 0, 1]]])
        d = jnp.asarray(
            np.random.RandomState(1).uniform(1, 3, (1, 32, 32)).astype(
                np.float32
            )
        )
        pc, _ = depthmap_to_camera_frame(d, K)
        f = recover_focal(pc, jnp.ones((1, 32, 32)))
        np.testing.assert_allclose(float(f[0]), 40.0, rtol=0.02)

    def test_registry(self):
        w = init_model("must3r", size="small")
        assert w.cfg.dec_depth == 2


class TestMASt3RSGA:
    def test_reciprocal_matching_exact(self):
        from mapanything_tpu.models.external.mast3r import reciprocal_matches

        rng = np.random.RandomState(0)
        H, W, D = 16, 16, 8
        d1 = rng.randn(H, W, D).astype(np.float32)
        d1 /= np.linalg.norm(d1, axis=-1, keepdims=True)
        shift = 3
        d2 = np.roll(d1, shift, axis=1)
        p1, p2, ok = jax.device_get(
            reciprocal_matches(jnp.asarray(d1), jnp.asarray(d2), subsample=4)
        )
        assert ok.all()
        np.testing.assert_array_equal(p2[:, 0], (p1[:, 0] + shift) % W)
        np.testing.assert_array_equal(p2[:, 1], p1[:, 1])

    def test_end_to_end_small(self):
        w = init_model(
            "mast3r_sga",
            size="small",
            sparse_ga_niter1=10,
            sparse_ga_niter2=10,
        )
        imgs = jnp.asarray(
            np.random.RandomState(0).rand(1, 3, 32, 32, 3).astype(np.float32)
        )
        params = w.init(jax.random.PRNGKey(0), imgs)
        res = w.apply(params, imgs)
        assert len(res) == 3
        assert all(
            np.isfinite(np.asarray(v)).all() for r in res for v in r.values()
        )


class TestMoGe2:
    def test_forward_shapes(self):
        import jax
        import jax.numpy as jnp

        from mapanything_tpu.models.external.moge import (
            MoGe2Config,
            MoGe2Model,
        )

        m = MoGe2Model(MoGe2Config.small())
        x = jnp.zeros((1, 28, 28, 3))
        p = jax.jit(m.init)(jax.random.PRNGKey(0), x)
        out = jax.jit(m.apply)(p, x)
        assert out["points"].shape == (1, 28, 28, 3)
        assert out["normal"].shape == (1, 28, 28, 3)
        assert out["mask"].shape == (1, 28, 28)
        assert out["metric_scale"].shape == (1,)
        import numpy as np

        n = np.asarray(out["normal"])
        np.testing.assert_allclose(
            np.linalg.norm(n, axis=-1), 1.0, atol=1e-5
        )
        assert float(out["points"][..., 2].min()) > 0  # exp remap

    def test_wrapper_and_registry(self):
        import jax
        import jax.numpy as jnp

        from mapanything_tpu.models.registry import MODEL_REGISTRY, init_model

        for name in ("moge_1", "moge_2", "metric_dust3r"):
            assert name in MODEL_REGISTRY, name
        w = init_model("moge_2", size="small")
        imgs = jnp.zeros((1, 2, 28, 28, 3))
        p = jax.jit(w.init)(jax.random.PRNGKey(0), imgs)
        res = w.apply(p, imgs)
        assert len(res) == 2 and res[0]["pts3d"].shape == (1, 28, 28, 3)
