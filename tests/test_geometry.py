"""Property tests for the geometry core against closed forms and roundtrips."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from mapanything_tpu import geometry as geo


def random_rotmats(rng, shape=()):
    n = int(np.prod(shape)) if shape else 1
    mats = Rotation.random(n, random_state=rng).as_matrix()
    return mats.reshape(shape + (3, 3)).astype(np.float32)


def random_quats_xyzw(rng, shape=()):
    n = int(np.prod(shape)) if shape else 1
    q = Rotation.random(n, random_state=rng).as_quat()  # scipy is xyzw
    return q.reshape(shape + (4,)).astype(np.float32)


class TestQuaternions:
    def test_quat_to_rotmat_matches_scipy(self):
        rng = np.random.RandomState(0)
        q = random_quats_xyzw(rng, (16,))
        ours = np.asarray(geo.quat_to_rotmat(jnp.asarray(q)))
        ref = Rotation.from_quat(q).as_matrix()
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_rotmat_to_quat_roundtrip(self):
        rng = np.random.RandomState(1)
        m = random_rotmats(rng, (32,))
        q = geo.rotmat_to_quat(jnp.asarray(m))
        m2 = np.asarray(geo.quat_to_rotmat(q))
        np.testing.assert_allclose(m2, m, atol=1e-5)
        # standardized: non-negative w
        assert np.all(np.asarray(q)[..., 3] >= 0)

    def test_rotmat_to_quat_edge_cases(self):
        # identity and 180-degree rotations stress the candidate selection
        mats = [np.eye(3)]
        for axis in range(3):
            m = -np.eye(3)
            m[axis, axis] = 1.0
            mats.append(m)
        m = jnp.asarray(np.stack(mats), jnp.float32)
        q = geo.rotmat_to_quat(m)
        m2 = np.asarray(geo.quat_to_rotmat(q))
        np.testing.assert_allclose(m2, np.asarray(m), atol=1e-5)

    def test_quat_multiply_matches_rotation_compose(self):
        rng = np.random.RandomState(2)
        q1 = random_quats_xyzw(rng, (8,))
        q2 = random_quats_xyzw(rng, (8,))
        qm = np.asarray(geo.quat_multiply(jnp.asarray(q1), jnp.asarray(q2)))
        ref = (Rotation.from_quat(q1) * Rotation.from_quat(q2)).as_quat()
        # up to sign
        sign = np.sign(np.sum(qm * ref, axis=-1, keepdims=True))
        np.testing.assert_allclose(qm, ref * sign, atol=1e-5)

    def test_quat_inverse(self):
        rng = np.random.RandomState(3)
        q = jnp.asarray(random_quats_xyzw(rng, (8,)))
        prod = geo.quat_multiply(q, geo.quat_inverse(q))
        ident = np.zeros((8, 4), np.float32)
        ident[:, 3] = 1.0
        np.testing.assert_allclose(np.asarray(prod), ident, atol=1e-5)

    def test_quat_rotate_matches_matrix(self):
        rng = np.random.RandomState(4)
        q = jnp.asarray(random_quats_xyzw(rng, (8,)))
        v = jnp.asarray(rng.randn(8, 3).astype(np.float32))
        out = geo.quat_rotate(q, v)
        ref = jnp.einsum("bij,bj->bi", geo.quat_to_rotmat(q), v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_relative_pose_quats_trans(self):
        rng = np.random.RandomState(5)
        q1 = jnp.asarray(random_quats_xyzw(rng, (4,)))
        q2 = jnp.asarray(random_quats_xyzw(rng, (4,)))
        t1 = jnp.asarray(rng.randn(4, 3).astype(np.float32))
        t2 = jnp.asarray(rng.randn(4, 3).astype(np.float32))
        qr, tr = geo.relative_pose_quats_trans(q1, t1, q2, t2)
        # matrix reference: P_rel = inv(P1) @ P2
        p1 = geo.quats_trans_to_pose_matrix(q1, t1)
        p2 = geo.quats_trans_to_pose_matrix(q2, t2)
        p_rel = geo.relative_pose_transformation(p1, p2)
        p_ours = geo.quats_trans_to_pose_matrix(qr, tr)
        np.testing.assert_allclose(np.asarray(p_ours), np.asarray(p_rel), atol=1e-5)

    def test_pose_matrix_quats_roundtrip(self):
        rng = np.random.RandomState(6)
        q = jnp.asarray(random_quats_xyzw(rng, (8,)))
        t = jnp.asarray(rng.randn(8, 3).astype(np.float32))
        pose = geo.quats_trans_to_pose_matrix(q, t)
        q2, t2 = geo.pose_matrix_to_quats_trans(pose)
        pose2 = geo.quats_trans_to_pose_matrix(q2, t2)
        np.testing.assert_allclose(np.asarray(pose2), np.asarray(pose), atol=1e-5)


class TestCamera:
    def _K(self, fx=100.0, fy=120.0, cx=31.5, cy=23.5):
        return jnp.asarray([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], jnp.float32)

    def test_depth_unproject_project_roundtrip(self):
        rng = np.random.RandomState(0)
        K = self._K()
        depth = jnp.asarray(rng.uniform(1.0, 5.0, (48, 64)).astype(np.float32))
        pts, valid = geo.depthmap_to_camera_frame(depth, K)
        assert bool(jnp.all(valid))
        uv = geo.project_pts3d_to_image(pts, K)
        xg, yg = geo.pixel_grid(48, 64)
        np.testing.assert_allclose(np.asarray(uv[..., 0]), np.asarray(xg), atol=1e-3)
        np.testing.assert_allclose(np.asarray(uv[..., 1]), np.asarray(yg), atol=1e-3)

    def test_world_frame_uses_pose(self):
        rng = np.random.RandomState(1)
        K = self._K()
        depth = jnp.asarray(rng.uniform(1.0, 5.0, (24, 32)).astype(np.float32))
        q = jnp.asarray(random_quats_xyzw(rng))
        t = jnp.asarray(rng.randn(3).astype(np.float32))
        pose = geo.quats_trans_to_pose_matrix(q, t)
        pts_w, _ = geo.depthmap_to_world_frame(depth, K, pose)
        pts_c, _ = geo.depthmap_to_camera_frame(depth, K)
        ref = geo.transform_pts3d(pts_c, pose)
        np.testing.assert_allclose(np.asarray(pts_w), np.asarray(ref), atol=1e-4)

    def test_rays_times_depth_along_ray_equals_pointmap(self):
        rng = np.random.RandomState(2)
        K = self._K()
        z_depth = jnp.asarray(rng.uniform(1.0, 5.0, (24, 32)).astype(np.float32))
        _, dirs = geo.rays_in_camera_frame(K, 24, 32, normalize_to_unit_sphere=True)
        d_along = geo.convert_z_depth_to_depth_along_ray(z_depth, K)
        pts_from_rays = dirs * d_along[..., None]
        pts_ref, _ = geo.depthmap_to_camera_frame(z_depth, K)
        np.testing.assert_allclose(
            np.asarray(pts_from_rays), np.asarray(pts_ref), atol=1e-3
        )
        # and z recovery
        z_rec = geo.depth_along_ray_to_z_depth(d_along, dirs)
        np.testing.assert_allclose(np.asarray(z_rec), np.asarray(z_depth), atol=1e-3)

    def test_intrinsics_recovery_roundtrip(self):
        K = self._K(fx=140.0, fy=150.0, cx=30.0, cy=26.0)
        _, dirs = geo.rays_in_camera_frame(K, 48, 64, normalize_to_unit_sphere=True)
        K_rec = geo.recover_pinhole_intrinsics_from_ray_directions(dirs)
        np.testing.assert_allclose(np.asarray(K_rec), np.asarray(K), atol=1e-2)

    def test_intrinsics_recovery_batched(self):
        Ks = jnp.stack([self._K(100.0, 110.0, 31.5, 23.5), self._K(90.0, 95.0, 32.0, 24.0)])
        _, dirs = geo.rays_in_camera_frame(Ks, 48, 64, normalize_to_unit_sphere=True)
        K_rec = geo.recover_pinhole_intrinsics_from_ray_directions(dirs)
        np.testing.assert_allclose(np.asarray(K_rec), np.asarray(Ks), atol=1e-2)

    def test_factored_rep_to_pointmap(self):
        rng = np.random.RandomState(3)
        K = self._K()
        depth = jnp.asarray(rng.uniform(1.0, 5.0, (24, 32)).astype(np.float32))
        q = jnp.asarray(random_quats_xyzw(rng))
        t = jnp.asarray(rng.randn(3).astype(np.float32))
        pose = geo.quats_trans_to_pose_matrix(q, t)

        _, dirs = geo.rays_in_camera_frame(K, 24, 32, normalize_to_unit_sphere=True)
        d_along = geo.convert_z_depth_to_depth_along_ray(depth, K)
        pts = geo.pointmap_from_rays_depth_pose(dirs, d_along[..., None], t, q)
        ref, _ = geo.depthmap_to_world_frame(depth, K, pose)
        np.testing.assert_allclose(np.asarray(pts), np.asarray(ref), atol=1e-3)

    def test_pose_inverse(self):
        rng = np.random.RandomState(4)
        q = jnp.asarray(random_quats_xyzw(rng, (4,)))
        t = jnp.asarray(rng.randn(4, 3).astype(np.float32))
        pose = geo.quats_trans_to_pose_matrix(q, t)
        inv = geo.closed_form_pose_inverse(pose)
        prod = jnp.einsum("bij,bjk->bik", pose, inv)
        np.testing.assert_allclose(
            np.asarray(prod), np.broadcast_to(np.eye(4), (4, 4, 4)), atol=1e-5
        )


class TestNormalization:
    def test_normalize_depth_nonzero(self):
        depth = jnp.asarray(
            [[[[2.0], [0.0]], [[4.0], [0.0]]]]
        )  # (1, 2, 2, 1), valid mean = 3
        norm, factor = geo.normalize_depth_using_non_zero_pixels(depth, True)
        np.testing.assert_allclose(np.asarray(factor), [3.0], rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(norm[0, :, :, 0]), [[2 / 3, 0.0], [4 / 3, 0.0]], rtol=1e-5
        )

    def test_normalize_pose_translations(self):
        t = jnp.asarray([[[3.0, 0, 0], [0, 0, 0], [0, 4.0, 0]]])  # mean nonzero norm 3.5
        norm, factor = geo.normalize_pose_translations(t, True)
        np.testing.assert_allclose(np.asarray(factor), [3.5], rtol=1e-5)
        np.testing.assert_allclose(np.asarray(norm[0, 0, 0]), 3.0 / 3.5, rtol=1e-5)

    def test_normalize_pointcloud_avg_dis(self):
        rng = np.random.RandomState(0)
        pts = jnp.asarray(rng.randn(2, 3, 8, 8, 3).astype(np.float32)) * 5
        out, nf = geo.normalize_pointcloud(pts, None, "avg_dis", True)
        # after normalization, mean distance ~ 1
        d = jnp.linalg.norm(out, axis=-1)
        np.testing.assert_allclose(
            np.asarray(jnp.mean(d, axis=(1, 2, 3))), [1.0, 1.0], rtol=1e-4
        )

    def test_apply_log_to_norm_keeps_direction(self):
        v = jnp.asarray([[3.0, 4.0, 0.0]])
        out = geo.apply_log_to_norm(v)
        d = np.log1p(5.0)
        np.testing.assert_allclose(np.asarray(out), [[0.6 * d, 0.8 * d, 0.0]], rtol=1e-4)


class TestNormalsAndEdges:
    def test_plane_normals(self):
        # z = 5 plane -> normals along -z or +z consistently, unit norm
        pts = np.zeros((16, 16, 3), np.float32)
        xg, yg = np.meshgrid(np.arange(16), np.arange(16), indexing="xy")
        pts[..., 0] = xg
        pts[..., 1] = yg
        pts[..., 2] = 5.0
        normal, nmask = geo.points_to_normals(jnp.asarray(pts))
        inner = np.asarray(normal)[2:-2, 2:-2]
        np.testing.assert_allclose(np.abs(inner[..., 2]), 1.0, atol=1e-5)
        assert bool(np.all(np.asarray(nmask)[1:-1, 1:-1]))

    def test_depth_edge_detects_step(self):
        depth = np.ones((16, 16), np.float32)
        depth[:, 8:] = 5.0
        edge = geo.depth_edge(jnp.asarray(depth), rtol=0.5)
        e = np.asarray(edge)
        assert e[:, 7].all() and e[:, 8].all()
        assert not e[:, :6].any() and not e[:, 10:].any()

    def test_normals_edge_detects_crease(self):
        # two planes meeting at a 90-degree crease
        normals = np.zeros((16, 16, 3), np.float32)
        normals[:, :8, 2] = 1.0
        normals[:, 8:, 0] = 1.0
        edge = geo.normals_edge(jnp.asarray(normals), tol_deg=30.0)
        e = np.asarray(edge)
        assert e[:, 7].all() and e[:, 8].all()
        assert not e[:, :5].any() and not e[:, 11:].any()


class TestFrustumMask:
    def test_self_consistency(self):
        # A view is always consistent with itself. Smooth depth: identity
        # projections land exactly on pixel centers where nearest-neighbor
        # rounding is ambiguous (same in torch grid_sample), so neighbors
        # must agree within the depth-match tolerance.
        K = jnp.asarray(
            [[[50.0, 0, 15.5], [0, 50.0, 11.5], [0, 0, 1]]], jnp.float32
        )
        yg, xg = np.mgrid[0:24, 0:32]
        depth = jnp.asarray(
            (3.0 + 0.01 * xg + 0.01 * yg)[None].astype(np.float32)
        )
        c2w = jnp.eye(4)[None]
        no_prior = jnp.zeros((1, 1, 24, 32), bool)
        mask, valid = geo.calculate_in_frustum_mask(
            depth[None], K[None], c2w[None], no_prior[0][None],
            depth[None], K[None], c2w[None], jnp.ones((1, 1, 24, 32), bool),
        )
        # interior pixels (u>0 strictly) must all be re-observed
        m = np.asarray(mask)[0, 0]
        assert m[2:-2, 2:-2].all()

    def test_disjoint_views(self):
        # Cameras facing opposite directions share no frustum overlap.
        rng = np.random.RandomState(1)
        K = jnp.asarray(
            [[[50.0, 0, 15.5], [0, 50.0, 11.5], [0, 0, 1]]], jnp.float32
        )
        depth = jnp.asarray(rng.uniform(2.0, 4.0, (1, 24, 32)).astype(np.float32))
        c2w_1 = jnp.eye(4)[None]
        flip = np.eye(4)
        flip[0, 0] = flip[2, 2] = -1.0  # 180-degree rotation about y
        c2w_2 = jnp.asarray(flip, jnp.float32)[None]
        no_prior = jnp.zeros((1, 1, 24, 32), bool)
        mask, valid = geo.calculate_in_frustum_mask(
            depth[None], K[None], c2w_1[None], no_prior,
            depth[None], K[None], c2w_2[None], jnp.ones((1, 1, 24, 32), bool),
        )
        assert not np.asarray(mask).any()


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
