"""Property tests for the production loss: perfect preds, perturbation response."""

import jax.numpy as jnp
import numpy as np
import pytest

from mapanything_tpu.train.losses import (
    LossConfig,
    dust3r_regr3d_conf_loss,
    factored_geometry_scale_loss,
)
from test_benchmark_and_parallel import perfect_batch_and_preds


def loss_with(preds_mod=None, batch_mod=None, cfg=LossConfig(), conf_value=1.0):
    batch, preds = perfect_batch_and_preds(B=2, V=3)
    preds = preds.replace(
        conf=jnp.full(batch.valid_mask.shape, conf_value),
        non_ambiguous_mask_logits=jnp.full(batch.valid_mask.shape, 4.0),
    )
    if preds_mod:
        preds = preds_mod(preds)
    if batch_mod:
        batch = batch_mod(batch)
    total, details = factored_geometry_scale_loss(batch, preds, cfg)
    return float(total), {k: float(v) for k, v in details.items()}


class TestFactoredLoss:
    def test_perfect_predictions_small_loss(self):
        total, d = loss_with()
        # geometry terms must vanish; conf term contributes -alpha*log(1)=0;
        # mask BCE with logits 4 on all-true targets ~ 0.018 * V
        assert d["pts3d_conf_loss"] < 1e-3
        assert d["cam_pts3d_loss"] < 1e-3
        assert d["depth_loss"] < 1e-3
        assert d["ray_dirs_loss"] < 1e-3
        assert d["pose_quats_loss"] < 1e-3
        assert d["pose_trans_loss"] < 1e-3
        assert d["scale_loss"] < 1e-3
        assert d["normal_loss"] < 1e-2
        assert d["gm_loss"] < 1e-2
        assert np.isfinite(total)

    @pytest.mark.parametrize(
        "field,detail",
        [
            ("depth_along_ray", "depth_loss"),
            ("ray_directions", "ray_dirs_loss"),
            ("cam_quats", "pose_quats_loss"),
            ("cam_trans", "pose_trans_loss"),
        ],
    )
    def test_each_term_responds_to_its_perturbation(self, field, detail):
        rng = np.random.RandomState(0)

        def perturb(preds):
            val = getattr(preds, field)
            noise = jnp.asarray(rng.randn(*val.shape).astype(np.float32)) * 0.1
            return preds.replace(**{field: val + noise})

        base_total, base = loss_with()
        _, worse = loss_with(preds_mod=perturb)
        assert worse[detail] > base[detail] + 1e-3, (detail, base[detail], worse[detail])

    def test_scale_term_responds_to_wrong_scale(self):
        # A genuinely mis-scaled metric prediction scales every metric
        # quantity together (the raw geometry is s-normalized inside the
        # loss, so only the joint scaling moves the scale term — parity
        # with the reference's detach-based scale loss).
        def wrong_scale(preds):
            return preds.replace(
                pts3d=preds.pts3d * 3.0,
                pts3d_cam=preds.pts3d_cam * 3.0,
                depth_along_ray=preds.depth_along_ray * 3.0,
                cam_trans=preds.cam_trans * 3.0,
                metric_scaling_factor=preds.metric_scaling_factor * 3.0,
            )

        base_total, base = loss_with()
        _, worse = loss_with(preds_mod=wrong_scale)
        assert worse["scale_loss"] > base["scale_loss"] + 1e-3
        # geometry terms stay ~unchanged (normalization removes the scale)
        assert abs(worse["depth_loss"] - base["depth_loss"]) < 1e-3

    def test_confidence_tradeoff(self):
        # With imperfect predictions, high confidence must cost more than
        # low confidence (conf-weighted loss), reference ConfLoss semantics.
        rng = np.random.RandomState(1)

        def noisy(preds):
            n = jnp.asarray(rng.randn(*preds.pts3d.shape).astype(np.float32)) * 0.5
            return preds.replace(pts3d=preds.pts3d + n)

        _, hi = loss_with(preds_mod=noisy, conf_value=10.0)
        rng = np.random.RandomState(1)
        _, lo = loss_with(preds_mod=noisy, conf_value=1.0)
        assert hi["pts3d_conf_loss"] > lo["pts3d_conf_loss"]

    def test_mask_loss_penalizes_wrong_logits(self):
        def wrong_mask(preds):
            return preds.replace(
                non_ambiguous_mask_logits=jnp.full_like(
                    preds.non_ambiguous_mask_logits, -4.0
                )
            )

        _, base = loss_with()
        _, worse = loss_with(preds_mod=wrong_mask)
        assert worse["mask_loss"] > base["mask_loss"] + 1.0

    def test_top_n_exclusion_caps_outliers(self):
        # A few huge depth outliers on REAL data should be excluded (top-5%),
        # but kept on synthetic data.
        def outliers(preds):
            d = np.asarray(preds.depth_along_ray).copy()
            d[:, :, :1, :1, :] *= 50.0  # < 5% of pixels
            return preds.replace(depth_along_ray=jnp.asarray(d))

        def real_data(batch):
            return batch.replace(is_synthetic=jnp.zeros_like(batch.is_synthetic))

        def synth_data(batch):
            return batch.replace(is_synthetic=jnp.ones_like(batch.is_synthetic))

        _, real = loss_with(preds_mod=outliers, batch_mod=real_data)
        _, synth = loss_with(preds_mod=outliers, batch_mod=synth_data)
        assert real["depth_loss"] < synth["depth_loss"], (real, synth)

    def test_criterion_variants_run(self):
        for crit in ("l1", "l2"):
            total, _ = loss_with(cfg=LossConfig(criterion=crit))
            assert np.isfinite(total)

    def test_scale_invariance_of_geometry_terms(self):
        # Non-metric GT at a different global scale should produce the same
        # normalized geometry losses (avg_dis normalization).
        def scale_all(batch):
            return batch.replace(
                pts3d=batch.pts3d * 7.0,
                pts3d_cam=batch.pts3d_cam * 7.0,
                depth_along_ray=batch.depth_along_ray * 7.0,
                camera_pose_trans=batch.camera_pose_trans * 7.0,
                is_metric_scale=jnp.zeros_like(batch.is_metric_scale),
            )

        def nonmetric(batch):
            return batch.replace(is_metric_scale=jnp.zeros_like(batch.is_metric_scale))

        _, a = loss_with(batch_mod=nonmetric)
        _, b = loss_with(batch_mod=scale_all)
        for key in ("cam_pts3d_loss", "depth_loss", "pts3d_conf_loss"):
            assert abs(a[key] - b[key]) < 2e-2, (key, a[key], b[key])


class TestDust3rLoss:
    def test_perfect_predictions(self):
        batch, preds = perfect_batch_and_preds(B=1, V=2)
        total, d = dust3r_regr3d_conf_loss(
            batch.pts3d, batch.valid_mask,
            (batch.camera_pose_quats[:, 0], batch.camera_pose_trans[:, 0]),
            preds.pts3d, jnp.ones(batch.valid_mask.shape),
        )
        assert d["regr3d_l2"] < 1e-4

    def test_noise_increases_loss(self):
        batch, preds = perfect_batch_and_preds(B=1, V=2)
        rng = np.random.RandomState(0)
        args = (
            batch.pts3d, batch.valid_mask,
            (batch.camera_pose_quats[:, 0], batch.camera_pose_trans[:, 0]),
        )
        conf = jnp.ones(batch.valid_mask.shape)
        base, _ = dust3r_regr3d_conf_loss(*args, preds.pts3d, conf)
        noise = jnp.asarray(rng.randn(*preds.pts3d.shape).astype(np.float32)) * 0.3
        worse, _ = dust3r_regr3d_conf_loss(*args, preds.pts3d + noise, conf)
        assert float(worse) > float(base)


if __name__ == "__main__":
    pytest.main([__file__, "-q", "-x"])


class TestDisentangledLoss:
    """DisentangledFactoredGeometryScaleRegr3D parity properties
    (reference losses.py:4521): zero at GT, and each term responds ONLY
    to its own factor's perturbation."""

    def _setup(self):
        import jax.numpy as jnp
        import numpy as np

        from mapanything_tpu.models.mapanything import Predictions
        from mapanything_tpu.train.losses import LossBatch

        rng = np.random.RandomState(0)
        B, V, H, W = 1, 2, 8, 8
        K = np.array([[8.0, 0, 3.5], [0, 8.0, 3.5], [0, 0, 1]])
        depth = rng.uniform(2, 4, (B, V, H, W, 1)).astype(np.float32)
        yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
        pts_cam = np.stack(
            [(xx - 3.5) / 8.0, (yy - 3.5) / 8.0, np.ones_like(xx)], -1
        )
        rays = pts_cam / np.linalg.norm(pts_cam, axis=-1, keepdims=True)
        rays = np.broadcast_to(rays, (B, V, H, W, 3)).astype(np.float32)
        pts3d_cam = rays * depth
        quats = np.zeros((B, V, 4), np.float32); quats[..., 3] = 1
        trans = np.zeros((B, V, 3), np.float32); trans[:, 1, 0] = 0.5
        from mapanything_tpu.geometry.camera import (
            pointmap_from_rays_depth_pose,
        )

        pts3d = np.asarray(pointmap_from_rays_depth_pose(
            jnp.asarray(rays), jnp.asarray(depth), jnp.asarray(trans),
            jnp.asarray(quats),
        ))
        batch = LossBatch(
            pts3d=jnp.asarray(pts3d), pts3d_cam=jnp.asarray(pts3d_cam),
            depth_along_ray=jnp.asarray(depth),
            ray_directions=jnp.asarray(rays),
            camera_pose_quats=jnp.asarray(quats),
            camera_pose_trans=jnp.asarray(trans),
            valid_mask=jnp.ones((B, V, H, W), bool),
            non_ambiguous_mask=jnp.ones((B, V, H, W), bool),
            valid_non_ambiguous_mask=jnp.ones((B, V, H, W), bool),
            is_metric_scale=jnp.ones((B,), bool),
            is_synthetic=jnp.zeros((B,), bool),
        )
        from mapanything_tpu.geometry.normalization import (
            normalize_pointcloud,
        )

        _, nf = normalize_pointcloud(
            jnp.asarray(pts3d), batch.valid_mask, "avg_dis", True
        )
        preds = Predictions(
            pts3d=jnp.asarray(pts3d), pts3d_cam=jnp.asarray(pts3d_cam),
            ray_directions=jnp.asarray(rays),
            depth_along_ray=jnp.asarray(depth),
            cam_trans=jnp.asarray(trans), cam_quats=jnp.asarray(quats),
            metric_scaling_factor=jnp.ones((1,)),
        )
        return batch, preds

    def test_zero_at_gt_and_factor_isolation(self):
        import dataclasses

        from mapanything_tpu.train.losses import (
            LossConfig,
            disentangled_factored_geometry_scale_loss,
        )

        batch, preds = self._setup()
        cfg = LossConfig(criterion="l1", disentangled=True)
        total, details = disentangled_factored_geometry_scale_loss(
            batch, preds, cfg
        )
        # scale term is nonzero only through norm-factor mismatch; the
        # factor terms must vanish exactly at GT
        for k in ("depth_loss", "ray_dirs_loss", "pose_quats_loss",
                  "pose_trans_loss"):
            assert float(details[k]) < 1e-5, (k, float(details[k]))

        # Perturb ONLY the depth; only the depth term moves.
        preds_d = preds.replace(
            depth_along_ray=preds.depth_along_ray * 1.2
        )
        _, dd = disentangled_factored_geometry_scale_loss(batch, preds_d, cfg)
        assert float(dd["depth_loss"]) > 1e-3
        for k in ("ray_dirs_loss", "pose_quats_loss", "pose_trans_loss"):
            assert float(dd[k]) < 1e-5, k

        # Perturb ONLY the translation; only the trans term moves.
        preds_t = preds.replace(cam_trans=preds.cam_trans + 0.3)
        _, dt = disentangled_factored_geometry_scale_loss(batch, preds_t, cfg)
        assert float(dt["pose_trans_loss"]) > 1e-3
        for k in ("depth_loss", "ray_dirs_loss", "pose_quats_loss"):
            assert float(dt[k]) < 1e-5, k

    def test_dispatch_via_config(self):
        from mapanything_tpu.train.losses import (
            LossConfig,
            factored_geometry_scale_loss,
        )

        batch, preds = self._setup()
        total, details = factored_geometry_scale_loss(
            batch, preds, LossConfig(criterion="l1", disentangled=True)
        )
        assert "pose_trans_loss" in details and float(total) >= 0


class TestZeroPixelGradients:
    """A single all-zero predicted pixel must not NaN the gradient.

    On-chip forensics (round 4, lr=1e-4 from random init): a depth logit
    below ~-87 underflows the exp adaptor to exactly 0.0; the zero pointmap
    pixel then NaNs dL/dpts3d through jnp.linalg.norm's 0/0 backward in the
    joint normalization while the LOSS VALUE stays finite, and the next
    update NaNs every parameter. torch's norm returns the 0 subgradient, so
    the reference never hits this — safe_norm restores that semantics.
    """

    def _grads(self, zero_pixel, huge_pixel=False):
        import jax

        batch, preds = perfect_batch_and_preds(B=1, V=2)
        preds = preds.replace(
            conf=jnp.full(batch.valid_mask.shape, 2.0),
            non_ambiguous_mask_logits=jnp.full(batch.valid_mask.shape, 4.0),
        )
        depth = np.asarray(preds.depth_along_ray).copy()
        if zero_pixel:
            depth[0, 0, 1, 1, 0] = 0.0
        if huge_pixel:
            depth[0, 1, 2, 2, 0] = 3.7e8

        def loss_of(d):
            pts_cam = preds.ray_directions * d
            p = preds.replace(depth_along_ray=d, pts3d_cam=pts_cam,
                              pts3d=pts_cam + 0.1)
            total, _ = factored_geometry_scale_loss(batch, p, LossConfig())
            return total

        val = float(loss_of(jnp.asarray(depth)))
        g = jax.grad(loss_of)(jnp.asarray(depth))
        return val, g

    def test_zero_depth_pixel_finite_grads(self):
        val, g = self._grads(zero_pixel=True)
        assert np.isfinite(val)
        assert bool(jnp.all(jnp.isfinite(g))), "NaN grads from a zero pixel"

    def test_zero_and_huge_depth_finite_grads(self):
        val, g = self._grads(zero_pixel=True, huge_pixel=True)
        assert np.isfinite(val)
        assert bool(jnp.all(jnp.isfinite(g)))

    def test_safe_norm_forward_matches_linalg(self):
        from mapanything_tpu.geometry.normalization import safe_norm

        rng = np.random.RandomState(3)
        x = jnp.asarray(rng.randn(64, 3).astype(np.float32))
        np.testing.assert_allclose(
            np.asarray(safe_norm(x, axis=-1)),
            np.asarray(jnp.linalg.norm(x, axis=-1)),
            rtol=1e-6,
        )
        assert float(safe_norm(jnp.zeros((4, 3)))[0]) == 0.0
