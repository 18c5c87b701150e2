"""Tests: dense N-view benchmark metrics + view-sharded many-view inference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mapanything_tpu.benchmarking.calibration import compute_calibration_metrics
from mapanything_tpu.benchmarking.dense_n_view import (
    METRIC_NAMES,
    compute_set_metrics,
)
from mapanything_tpu.geometry.quaternion import quats_trans_to_pose_matrix
from mapanything_tpu.models.mapanything import (
    MapAnything,
    MapAnythingConfig,
    Predictions,
    Views,
)
from mapanything_tpu.parallel.context import infer_view_sharded
from mapanything_tpu.parallel.mesh import make_mesh
from mapanything_tpu.train.losses import LossBatch


def perfect_batch_and_preds(B=1, V=3, H=24, W=32, seed=0):
    """GT batch + predictions equal to GT (up to global scale) -> zero errors."""
    rng = np.random.RandomState(seed)
    from scipy.spatial.transform import Rotation

    K = np.array([[40.0, 0, W / 2 - 0.5], [0, 40.0, H / 2 - 0.5], [0, 0, 1]], np.float32)
    quats, trans, pts_all, ptsc_all, depth_all, rays_all = [], [], [], [], [], []
    for b in range(B):
        qb, tb, pb, pcb, db, rb = [], [], [], [], [], []
        for v in range(V):
            R = Rotation.random(random_state=rng).as_matrix().astype(np.float32)
            t = rng.randn(3).astype(np.float32)
            depth_z = rng.uniform(2, 4, (H, W)).astype(np.float32)
            yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
            x_cam = (xx - K[0, 2]) * depth_z / K[0, 0]
            y_cam = (yy - K[1, 2]) * depth_z / K[1, 1]
            pts_cam = np.stack([x_cam, y_cam, depth_z], -1)
            pts = pts_cam @ R.T + t
            dirs = pts_cam / np.linalg.norm(pts_cam, axis=-1, keepdims=True)
            d_along = np.linalg.norm(pts_cam, axis=-1, keepdims=True)
            q = Rotation.from_matrix(R).as_quat().astype(np.float32)
            qb.append(q); tb.append(t); pb.append(pts); pcb.append(pts_cam)
            db.append(d_along); rb.append(dirs)
        quats.append(qb); trans.append(tb); pts_all.append(pb)
        ptsc_all.append(pcb); depth_all.append(db); rays_all.append(rb)

    arr = lambda x: jnp.asarray(np.asarray(x, np.float32))
    batch = LossBatch(
        pts3d=arr(pts_all),
        pts3d_cam=arr(ptsc_all),
        depth_along_ray=arr(depth_all),
        ray_directions=arr(rays_all),
        camera_pose_quats=arr(quats),
        camera_pose_trans=arr(trans),
        valid_mask=jnp.ones((B, V, H, W), bool),
        non_ambiguous_mask=jnp.ones((B, V, H, W), bool),
        valid_non_ambiguous_mask=jnp.ones((B, V, H, W), bool),
        is_metric_scale=jnp.ones((B,), bool),
        is_synthetic=jnp.zeros((B,), bool),
    )

    # Predictions = GT expressed in view-0 frame (the model's convention).
    from mapanything_tpu.geometry.quaternion import (
        quat_inverse, quat_rotate, relative_pose_quats_trans,
    )
    q0 = jnp.broadcast_to(batch.camera_pose_quats[:, :1], batch.camera_pose_quats.shape)
    t0 = jnp.broadcast_to(batch.camera_pose_trans[:, :1], batch.camera_pose_trans.shape)
    rel_q, rel_t = relative_pose_quats_trans(
        q0, t0, batch.camera_pose_quats, batch.camera_pose_trans
    )
    inv_q0 = quat_inverse(batch.camera_pose_quats[:, 0])
    pts_v0 = quat_rotate(
        inv_q0[:, None, None, None, :],
        batch.pts3d - batch.camera_pose_trans[:, 0][:, None, None, None, :],
    )
    preds = Predictions(
        pts3d=pts_v0,
        pts3d_cam=batch.pts3d_cam,
        ray_directions=batch.ray_directions,
        depth_along_ray=batch.depth_along_ray,
        cam_trans=rel_t,
        cam_quats=rel_q,
        metric_scaling_factor=jnp.ones((B,)),
        conf=jnp.ones((B, V, H, W)),
    )
    return batch, preds


class TestDenseNViewMetrics:
    def test_perfect_predictions_zero_error(self):
        batch, preds = perfect_batch_and_preds()
        results = compute_set_metrics(batch, preds)
        m = results[0]
        assert set(m) == set(METRIC_NAMES)
        assert m["pointmaps_abs_rel"] < 1e-4
        assert m["pointmaps_inlier_thres_103"] > 0.999
        assert m["z_depth_abs_rel"] < 1e-4
        assert m["pose_ate_rmse"] < 1e-5
        assert m["pose_auc_5"] > 99.0
        assert m["ray_dirs_err_deg"] < 0.01
        assert m["metric_scale_abs_rel"] < 1e-4

    def test_scaled_depth_degrades_metrics(self):
        batch, preds = perfect_batch_and_preds()
        bad = preds.replace(
            depth_along_ray=preds.depth_along_ray * 1.10,
            pts3d_cam=preds.pts3d_cam * 1.10,
            pts3d=preds.pts3d * 1.10,
        )
        good = compute_set_metrics(batch, preds)[0]
        worse = compute_set_metrics(batch, bad)[0]
        # global scaling is normalized away for pointmaps, but z-depth
        # ratio vs GT-normalized depth persists through independent norms
        assert worse["metric_scale_abs_rel"] > good["metric_scale_abs_rel"]

    def test_wrong_rays_detected(self):
        batch, preds = perfect_batch_and_preds()
        rng = np.random.RandomState(3)
        noise = jnp.asarray(rng.randn(*preds.ray_directions.shape).astype(np.float32)) * 0.05
        noisy = preds.ray_directions + noise
        noisy = noisy / jnp.linalg.norm(noisy, axis=-1, keepdims=True)
        bad = preds.replace(ray_directions=noisy)
        worse = compute_set_metrics(batch, bad)[0]
        assert worse["ray_dirs_err_deg"] > 1.0


class TestCalibrationMetric:
    def test_zero_for_identical(self):
        rng = np.random.RandomState(0)
        rays = rng.randn(1, 8, 8, 3)
        rays /= np.linalg.norm(rays, axis=-1, keepdims=True)
        assert compute_calibration_metrics(rays, rays) < 1e-4


class TestViewShardedInference:
    def test_16_views_sharded_over_mesh(self):
        devices = jax.devices()
        assert len(devices) >= 8, "conftest must provide 8 CPU devices"
        mesh = make_mesh(devices[:8], view_parallelism=4)

        cfg = MapAnythingConfig.small()
        model = MapAnything(cfg)
        B, V, H, W = 2, 16, 28, 28
        rng = np.random.RandomState(0)
        views = Views(img=jnp.asarray(rng.randn(B, V, H, W, 3).astype(np.float32)))
        params = jax.jit(model.init)(jax.random.PRNGKey(0), views)

        preds = infer_view_sharded(model, params, views, mesh)
        pts = jax.device_get(preds.pts3d)
        assert pts.shape == (B, V, H, W, 3)
        assert np.isfinite(pts).all()

        # must match the unsharded forward exactly (fp32)
        ref = model.apply(params, views)
        np.testing.assert_allclose(
            pts, np.asarray(ref.pts3d), rtol=2e-5, atol=2e-4
        )


if __name__ == "__main__":
    pytest.main([__file__, "-q", "-x"])


class TestFrustumMaskRefinement:
    def test_refine_batch(self):
        from mapanything_tpu.train.masks import refine_batch_with_frustum_masks

        batch, _ = perfect_batch_and_preds(B=1, V=3)
        B, V, H, W = batch.valid_mask.shape
        K = jnp.broadcast_to(
            jnp.asarray([[40.0, 0, W / 2 - 0.5], [0, 40.0, H / 2 - 0.5], [0, 0, 1]]),
            (B, V, 3, 3),
        )
        refined = refine_batch_with_frustum_masks(batch, K)
        # each view re-observes itself -> masks should stay mostly on
        m = np.asarray(refined.non_ambiguous_mask)
        assert m.mean() > 0.9
        assert refined.valid_mask.shape == batch.valid_mask.shape


class TestRMVDMetrics:
    def test_perfect_prediction(self):
        from mapanything_tpu.benchmarking.rmvd_mvs import rmvd_depth_metrics

        gt = np.random.RandomState(0).uniform(1, 5, (16, 16)).astype(np.float32)
        m = rmvd_depth_metrics(gt.copy(), gt)
        assert m["absrel"] == pytest.approx(0.0, abs=1e-5)
        assert m["inlier103"] == pytest.approx(100.0)
        assert m["scale"] == pytest.approx(1.0)

    def test_scale_ambiguity_aligned(self):
        from mapanything_tpu.benchmarking.rmvd_mvs import rmvd_depth_metrics

        gt = np.random.RandomState(1).uniform(1, 5, (16, 16)).astype(np.float32)
        m = rmvd_depth_metrics(gt * 0.25, gt, align_scale=True)
        # median scaling recovers the global factor exactly
        assert m["scale"] == pytest.approx(4.0, rel=1e-5)
        assert m["absrel"] == pytest.approx(0.0, abs=1e-4)
        m_noalign = rmvd_depth_metrics(gt * 0.25, gt, align_scale=False)
        assert m_noalign["absrel"] == pytest.approx(75.0, rel=1e-3)

    def test_invalid_gt_excluded(self):
        from mapanything_tpu.benchmarking.rmvd_mvs import rmvd_depth_metrics

        gt = np.ones((4, 4), np.float32)
        gt[0] = 0.0  # invalid rows
        pred = np.ones((4, 4), np.float32)
        pred[0] = 100.0  # wrong only where GT invalid
        m = rmvd_depth_metrics(pred, gt)
        assert m["absrel"] == pytest.approx(0.0, abs=1e-6)

    def test_all_invalid_returns_nan(self):
        from mapanything_tpu.benchmarking.rmvd_mvs import rmvd_depth_metrics

        m = rmvd_depth_metrics(np.ones((4, 4)), np.zeros((4, 4)))
        assert np.isnan(m["absrel"]) and np.isnan(m["inlier103"])


class TestGlobalPMOnlyMetrics:
    def test_perfect_and_degraded(self):
        from mapanything_tpu.benchmarking.dense_n_view import (
            compute_set_metrics_global_pm_only,
        )

        batch, preds = perfect_batch_and_preds()
        m = compute_set_metrics_global_pm_only(batch, preds.pts3d)[0]
        assert set(m) == {"pointmaps_abs_rel", "pointmaps_inlier_thres_103"}
        assert m["pointmaps_abs_rel"] < 1e-4
        assert m["pointmaps_inlier_thres_103"] > 0.999

        rng = np.random.RandomState(0)
        noisy = preds.pts3d + jnp.asarray(
            rng.randn(*preds.pts3d.shape).astype(np.float32) * 0.2
        )
        worse = compute_set_metrics_global_pm_only(batch, noisy)[0]
        assert worse["pointmaps_abs_rel"] > m["pointmaps_abs_rel"]
        assert (
            worse["pointmaps_inlier_thres_103"]
            < m["pointmaps_inlier_thres_103"]
        )


class TestBenchmarkRunners:
    """End-to-end run_benchmark over a real loader + small model (the same
    path the scripts/benchmark_*.py CLIs drive)."""

    @pytest.fixture(scope="class")
    def small_model_and_loader(self):
        import sys
        from pathlib import Path

        sys.path.insert(0, str(Path(__file__).resolve().parent))
        from test_data_layer import SyntheticScenes

        from mapanything_tpu.data.loader import get_test_data_loader

        ds = SyntheticScenes(
            n_scenes=2, frames_per_scene=8, num_views=2, split="test",
            covisibility_thres=0.25, resolution=(56, 56), seed=3,
        )
        loader = get_test_data_loader(ds, batch_size=1, num_workers=0)
        loader.set_epoch(0)
        cfg = MapAnythingConfig.small()
        model = MapAnything(cfg)
        first = next(iter(loader))
        params = jax.jit(model.init)(
            jax.random.PRNGKey(0), Views(img=jnp.asarray(first["img"]))
        )
        return model, params, loader

    def test_dense_n_view_runner(self, small_model_and_loader):
        from mapanything_tpu.benchmarking.dense_n_view import run_benchmark
        from mapanything_tpu.train.loop import loss_batch_from_numpy

        model, params, loader = small_model_and_loader
        results = run_benchmark(
            model, params, loader, loss_batch_from_numpy, max_batches=2
        )
        assert "overall" in results
        for key in ("pointmaps_abs_rel", "z_depth_abs_rel", "ray_dirs_err_deg"):
            assert key in results["overall"]
            assert np.isfinite(results["overall"][key])

    def test_calibration_runner(self, small_model_and_loader):
        from mapanything_tpu.benchmarking.calibration import run_benchmark

        model, params, loader = small_model_and_loader
        results = run_benchmark(model, params, loader, max_batches=2)
        assert np.isfinite(results["overall"]) and results["overall"] >= 0

    def test_rmvd_runner(self, small_model_and_loader):
        from mapanything_tpu.benchmarking.rmvd_mvs import run_benchmark

        model, params, loader = small_model_and_loader
        results = run_benchmark(model, params, loader, max_batches=2)
        assert np.isfinite(results["absrel"]) and results["num_samples"] > 0
