"""Tests for the offline WAI processing stages added on top of conversion/
covisibility: depth-consistency confidence, undistortion, pseudo-depth
(MoGe + plane-sweep MVS) and mesh rendering."""

import json
from pathlib import Path

import cv2
import numpy as np
import pytest

from mapanything_tpu.data_processing.depth_confidence import (
    compute_depth_consistency_confidence,
    write_depth_confidence,
)
from mapanything_tpu.data_processing.pseudo_depth import (
    plane_sweep_depth,
    run_moge_on_scene,
    run_mvs_on_scene,
)
from mapanything_tpu.data_processing.rendering import (
    read_ply_mesh,
    render_mesh,
    render_scene_frames,
)
from mapanything_tpu.data_processing.undistort import (
    undistort_precompute,
    undistort_scene,
    update_camera_meta,
)
from mapanything_tpu.utils.exr import read_depth_exr, write_depth_exr


def make_plane_scene(V=3, H=24, W=32, offset=0.3, depth=4.0):
    """Cameras translated along x viewing a fronto-parallel plane."""
    K = np.array(
        [[40.0, 0, W / 2 - 0.5], [0, 40.0, H / 2 - 0.5], [0, 0, 1]], np.float32
    )
    depths = np.full((V, H, W), depth, np.float32)
    poses = np.tile(np.eye(4, dtype=np.float32), (V, 1, 1))
    for v in range(V):
        poses[v, 0, 3] = v * offset
    return depths, np.tile(K, (V, 1, 1)), poses


def _texture(x, y):
    """Smooth high-contrast world-plane texture for photometric tests."""
    return (
        0.5
        + 0.25 * np.sin(3.1 * x + 0.7) * np.cos(2.3 * y - 0.2)
        + 0.25 * np.sin(7.9 * x * y + 1.3)
    ).astype(np.float32)


def make_textured_views(V=3, H=48, W=64, offset=0.25, depth=4.0):
    """Images of a textured plane at z=depth seen from x-translated cams."""
    K = np.array(
        [[50.0, 0, W / 2 - 0.5], [0, 50.0, H / 2 - 0.5], [0, 0, 1]], np.float32
    )
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    imgs = []
    for v in range(V):
        # pixel -> world point on the plane (camera at (v*offset, 0, 0))
        wx = (xs - K[0, 2]) / K[0, 0] * depth + v * offset
        wy = (ys - K[1, 2]) / K[1, 1] * depth
        g = _texture(wx, wy)
        imgs.append(np.stack([g, g, g], -1))
    poses = np.tile(np.eye(4, dtype=np.float32), (V, 1, 1))
    for v in range(V):
        poses[v, 0, 3] = v * offset
    return np.stack(imgs), np.tile(K, (V, 1, 1)), poses


def write_wai_scene(root: Path, imgs, Ks, poses, depths=None):
    """Minimal WAI scene directory with per-frame intrinsics."""
    root.mkdir(parents=True, exist_ok=True)
    (root / "images").mkdir(exist_ok=True)
    frames = []
    for i in range(imgs.shape[0]):
        name = f"frame_{i:04d}"
        rel = f"images/{name}.png"
        cv2.imwrite(
            str(root / rel),
            cv2.cvtColor((imgs[i] * 255).astype(np.uint8), cv2.COLOR_RGB2BGR),
        )
        fr = {
            "frame_name": name,
            "image": rel,
            "transform_matrix": poses[i].tolist(),
            "fl_x": float(Ks[i][0, 0]),
            "fl_y": float(Ks[i][1, 1]),
            "cx": float(Ks[i][0, 2]),
            "cy": float(Ks[i][1, 2]),
            "w": int(imgs.shape[2]),
            "h": int(imgs.shape[1]),
        }
        if depths is not None:
            (root / "depth").mkdir(exist_ok=True)
            drel = f"depth/{name}.exr"
            write_depth_exr(root / drel, depths[i])
            fr["depth"] = drel
        frames.append(fr)
    meta = {
        "scene_name": root.name,
        "shared_intrinsics": False,
        "camera_model": "PINHOLE",
        "camera_convention": "opencv",
        "frames": frames,
        "frame_modalities": {
            "image": {"frame_key": "image", "format": "image"},
        },
    }
    with open(root / "scene_meta.json", "w") as f:
        json.dump(meta, f)
    return meta


class TestDepthConfidence:
    def test_consistent_scene_high_confidence(self):
        depths, Ks, poses = make_plane_scene()
        conf = compute_depth_consistency_confidence(depths, Ks, poses)
        assert conf.shape == depths.shape
        # Pixels observed by another view agree perfectly -> confidence 1.
        seen = conf > 0
        assert seen.mean() > 0.5
        np.testing.assert_allclose(conf[seen], 1.0, atol=1e-5)

    def test_corrupted_view_low_confidence(self):
        depths, Ks, poses = make_plane_scene(V=2)
        depths[1] *= 2.0  # view 1 disagrees everywhere
        conf = compute_depth_consistency_confidence(depths, Ks, poses)
        # With the single partner view inconsistent, view-0 confidence
        # collapses to 0 wherever the reprojection lands in view 1.
        assert conf[0].max() < 1e-6

    def test_self_view_excluded(self):
        depths, Ks, poses = make_plane_scene(V=1)
        conf = compute_depth_consistency_confidence(depths, Ks, poses)
        # A lone view has no partners: all zeros, not trivial inliers.
        np.testing.assert_allclose(conf, 0.0)

    def test_writer_updates_scene_meta(self, tmp_path):
        depths, Ks, poses = make_plane_scene(V=2)
        imgs = np.zeros((2, 24, 32, 3), np.float32)
        write_wai_scene(tmp_path / "s", imgs, Ks, poses, depths)
        conf = compute_depth_consistency_confidence(depths, Ks, poses)
        paths = write_depth_confidence(
            tmp_path / "s", ["frame_0000", "frame_0001"], conf
        )
        assert all(p.exists() for p in paths)
        rt = read_depth_exr(paths[0])
        np.testing.assert_allclose(rt, conf[0], atol=1e-6)
        meta = json.loads((tmp_path / "s" / "scene_meta.json").read_text())
        assert "depth_confidence" in meta["frame_modalities"]
        assert "gt_depth_depth_confidence" in meta["frames"][0]


class TestUndistort:
    def _cam(self, model, **dist):
        return dict(
            fl_x=60.0, fl_y=60.0, cx=31.5, cy=23.5, w=64, h=48,
            camera_model=model, **dist,
        )

    def test_fisheye_zero_distortion_matches_model(self):
        cam = self._cam("OPENCV_FISHEYE", k1=0.0, k2=0.0, k3=0.0, k4=0.0)
        new_K, new_w, new_h, map1, map2, roi = undistort_precompute(
            cam, center_principal_point=False
        )
        assert (new_w, new_h) == (64, 48) and roi is None
        # With k1..k4 = 0 the fisheye (equidistant) forward model is
        # theta_d = theta = atan(r): the remap must equal projecting each
        # new-pinhole ray through that model with the ORIGINAL K.
        gx, gy = np.meshgrid(np.arange(64, dtype=np.float64), np.arange(48, dtype=np.float64))
        xh = (gx - new_K[0, 2]) / new_K[0, 0]
        yh = (gy - new_K[1, 2]) / new_K[1, 1]
        r = np.hypot(xh, yh)
        scale = np.where(r > 1e-9, np.arctan(r) / np.maximum(r, 1e-9), 1.0)
        exp_u = cam["fl_x"] * xh * scale + cam["cx"]
        exp_v = cam["fl_y"] * yh * scale + cam["cy"]
        np.testing.assert_allclose(map1, exp_u, atol=1e-3)
        np.testing.assert_allclose(map2, exp_v, atol=1e-3)

    def test_opencv_model_roi_and_principal_point(self):
        cam = self._cam("OPENCV", k1=-0.1, k2=0.01, p1=0.0, p2=0.0)
        new_K, new_w, new_h, map1, map2, roi = undistort_precompute(cam)
        assert roi is not None and new_w <= 64 and new_h <= 48
        # Principal point was shifted into the cropped frame.
        assert 0 <= new_K[0, 2] <= new_w and 0 <= new_K[1, 2] <= new_h

    def test_update_camera_meta_strips_distortion(self):
        cam = self._cam("OPENCV_FISHEYE", k1=0.1, k2=0.0, k3=0.0, k4=0.0)
        out = update_camera_meta(cam, np.eye(3, dtype=np.float32) * 50, 60, 40)
        assert out["camera_model"] == "PINHOLE"
        assert "k1" not in out and out["w"] == 60 and out["fl_x"] == 50.0

    def test_undistort_scene_rewrites_modalities(self, tmp_path):
        imgs = np.random.RandomState(0).rand(2, 48, 64, 3).astype(np.float32)
        depths = np.full((2, 48, 64), 3.0, np.float32)
        Ks = np.tile(
            np.array([[60.0, 0, 31.5], [0, 60.0, 23.5], [0, 0, 1]], np.float32),
            (2, 1, 1),
        )
        poses = np.tile(np.eye(4, dtype=np.float32), (2, 1, 1))
        scene = tmp_path / "scene"
        meta = write_wai_scene(scene, imgs, Ks, poses, depths)
        # Rewrite as a distorted fisheye scene.
        for fr in meta["frames"]:
            fr["image_distorted"] = fr.pop("image")
            fr["depth_distorted"] = fr.pop("depth")
            fr.update(camera_model="OPENCV_FISHEYE", k1=0.05, k2=0.0, k3=0.0, k4=0.0)
        meta["frame_modalities"] = {
            "image_distorted": {"frame_key": "image_distorted", "format": "image"}
        }
        (scene / "scene_meta.json").write_text(json.dumps(meta))

        done = undistort_scene(scene)
        assert len(done) == 2
        new_meta = json.loads((scene / "scene_meta.json").read_text())
        fr = new_meta["frames"][0]
        assert "image" in fr and "image_distorted" not in fr
        assert "depth" in fr and fr["camera_model"] == "PINHOLE"
        assert "k1" not in fr
        assert (scene / fr["image"]).exists()
        d = read_depth_exr(scene / fr["depth"])
        assert d.shape == (48, 64)
        assert "image" in new_meta["frame_modalities"]


class TestPlaneSweep:
    def test_recovers_plane_depth(self):
        imgs, Ks, poses = make_textured_views(V=3, depth=4.0)
        w2c = np.linalg.inv(poses)
        ref2nbr = (w2c[[1, 2]] @ poses[0]).astype(np.float32)
        import jax.numpy as jnp

        depth, conf = plane_sweep_depth(
            jnp.asarray(imgs[0]),
            jnp.asarray(imgs[[1, 2]]),
            jnp.asarray(Ks[0]),
            jnp.asarray(Ks[[1, 2]]),
            jnp.asarray(ref2nbr),
            1.0,
            16.0,
            num_planes=64,
            window_radius=2,
        )
        depth = np.asarray(depth)
        conf = np.asarray(conf)
        # Central crop: every neighbour observes it and ZNCC is sharp.
        c = (slice(8, 40), slice(8, 56))
        good = conf[c] > 0.5
        assert good.mean() > 0.8
        err = np.abs(depth[c][good] - 4.0) / 4.0
        assert np.median(err) < 0.05

    def test_run_mvs_on_scene_writes_modality(self, tmp_path):
        imgs, Ks, poses = make_textured_views(V=3)
        scene = tmp_path / "scene"
        write_wai_scene(scene, imgs, Ks, poses)
        paths = run_mvs_on_scene(scene, num_planes=32, num_neighbors=2)
        assert len(paths) == 3 and all(p.exists() for p in paths)
        meta = json.loads((scene / "scene_meta.json").read_text())
        assert meta["frame_modalities"]["pred_depth"]["mvs"]["format"] == "depth"
        assert "mvs_depth" in meta["frames"][0]
        d = read_depth_exr(paths[0])
        assert d.shape == imgs.shape[1:3]


class TestMoGeRunner:
    def test_run_moge_on_scene(self, tmp_path):
        imgs = np.random.RandomState(0).rand(2, 28, 28, 3).astype(np.float32)
        Ks = np.tile(
            np.array([[30.0, 0, 13.5], [0, 30.0, 13.5], [0, 0, 1]], np.float32),
            (2, 1, 1),
        )
        poses = np.tile(np.eye(4, dtype=np.float32), (2, 1, 1))
        scene = tmp_path / "scene"
        write_wai_scene(scene, imgs, Ks, poses)
        paths = run_moge_on_scene(scene, batch_size=2)
        assert len(paths) == 2 and all(p.exists() for p in paths)
        meta = json.loads((scene / "scene_meta.json").read_text())
        assert "moge" in meta["frame_modalities"]["pred_depth"]
        d = read_depth_exr(paths[0])
        assert d.shape == (28, 28) and np.isfinite(d).all() and (d >= 0).all()


class TestRendering:
    def _quad(self, z=5.0, half=10.0):
        """Two triangles spanning [-half, half]^2 at depth z."""
        verts = np.array(
            [
                [-half, -half, z],
                [half, -half, z],
                [half, half, z],
                [-half, half, z],
            ],
            np.float32,
        )
        faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
        return verts, faces

    def _cam(self, H=48, W=64, f=40.0):
        K = np.array(
            [[f, 0, W / 2 - 0.5], [0, f, H / 2 - 0.5], [0, 0, 1]], np.float32
        )
        return K, np.eye(4, dtype=np.float32), H, W

    def test_plane_depth_exact(self):
        verts, faces = self._quad(z=5.0)
        K, c2w, H, W = self._cam()
        depth, face_id, _ = render_mesh(verts, faces, K, c2w, H, W)
        hit = face_id >= 0
        assert hit.mean() > 0.9  # quad covers the whole frustum slice
        np.testing.assert_allclose(depth[hit], 5.0, rtol=1e-4)
        assert np.all(depth[~hit] == 0.0)

    def test_occlusion_nearer_wins(self):
        v1, f1 = self._quad(z=5.0)
        v2, f2 = self._quad(z=3.0, half=1.0)  # small nearer quad
        verts = np.concatenate([v1, v2])
        faces = np.concatenate([f1, f2 + 4])
        K, c2w, H, W = self._cam()
        depth, face_id, _ = render_mesh(verts, faces, K, c2w, H, W)
        cy, cx = H // 2, W // 2
        assert abs(depth[cy, cx] - 3.0) < 1e-3
        assert face_id[cy, cx] >= 2  # one of the nearer triangles
        assert abs(depth[2, 2] - 5.0) < 1e-3  # corner sees the far quad

    def test_perspective_correct_slanted(self):
        # Slanted quad: z varies linearly in world space; the rasterized
        # depth must match the analytic ray-plane intersection.
        verts = np.array(
            [[-10, -10, 4.0], [10, -10, 8.0], [10, 10, 8.0], [-10, 10, 4.0]],
            np.float32,
        )
        faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
        K, c2w, H, W = self._cam()
        depth, face_id, _ = render_mesh(verts, faces, K, c2w, H, W)
        # Plane: passes (x,z)=(-10,4),(10,8) -> z = 6 + 0.2 x, so along a
        # pixel ray x = u*z: z = 6 / (1 - 0.2 u) with u = (px - cx) / f.
        for px in [10, 32, 50]:
            u = (px - K[0, 2]) / K[0, 0]
            expect = 6.0 / (1.0 - 0.2 * u)
            assert abs(depth[H // 2, px] - expect) / expect < 1e-3

    def test_vertex_colors(self):
        verts, faces = self._quad(z=5.0)
        colors = np.tile(np.array([[0.2, 0.4, 0.8]], np.float32), (4, 1))
        K, c2w, H, W = self._cam()
        depth, face_id, color = render_mesh(
            verts, faces, K, c2w, H, W, vertex_colors=colors
        )
        hit = face_id >= 0
        np.testing.assert_allclose(
            color[hit],
            np.broadcast_to(np.array([0.2, 0.4, 0.8]), color[hit].shape),
            atol=1e-4,
        )

    def test_ply_roundtrip_ascii(self, tmp_path):
        p = tmp_path / "mesh.ply"
        p.write_text(
            "ply\nformat ascii 1.0\n"
            "element vertex 3\n"
            "property float x\nproperty float y\nproperty float z\n"
            "property uchar red\nproperty uchar green\nproperty uchar blue\n"
            "element face 1\n"
            "property list uchar int vertex_indices\n"
            "end_header\n"
            "0 0 1 255 0 0\n1 0 1 0 255 0\n0 1 1 0 0 255\n"
            "3 0 1 2\n"
        )
        verts, faces, colors = read_ply_mesh(p)
        assert verts.shape == (3, 3) and faces.shape == (1, 3)
        np.testing.assert_allclose(colors[0], [1.0, 0.0, 0.0])

    def test_render_scene_frames(self, tmp_path):
        imgs = np.zeros((2, 48, 64, 3), np.float32)
        K = np.array(
            [[40.0, 0, 31.5], [0, 40.0, 23.5], [0, 0, 1]], np.float32
        )
        Ks = np.tile(K, (2, 1, 1))
        poses = np.tile(np.eye(4, dtype=np.float32), (2, 1, 1))
        scene = tmp_path / "scene"
        meta = write_wai_scene(scene, imgs, Ks, poses)
        # Attach a quad mesh as a scene modality (binary PLY via our writer
        # is pointcloud-only, so write ascii with faces).
        verts, faces = self._quad(z=5.0)
        lines = [
            "ply", "format ascii 1.0",
            f"element vertex {len(verts)}",
            "property float x", "property float y", "property float z",
            f"element face {len(faces)}",
            "property list uchar int vertex_indices", "end_header",
        ]
        lines += [f"{v[0]} {v[1]} {v[2]}" for v in verts]
        lines += [f"3 {f0} {f1} {f2}" for f0, f1, f2 in faces]
        (scene / "mesh.ply").write_text("\n".join(lines) + "\n")
        meta["scene_modalities"] = {
            "mesh": {"scene_key": "mesh.ply", "format": "mesh"}
        }
        (scene / "scene_meta.json").write_text(json.dumps(meta))

        done = render_scene_frames(
            scene, modalities=("rendered_depth", "rendered_mesh_faces")
        )
        assert len(done) == 2
        new_meta = json.loads((scene / "scene_meta.json").read_text())
        fr = new_meta["frames"][0]
        d = read_depth_exr(scene / fr["rendered_depth"])
        assert d.shape == (48, 64)
        assert abs(d[24, 32] - 5.0) < 1e-3
        fid = np.load(scene / fr["rendered_mesh_faces"])["face_id"]
        assert fid.shape == (48, 64) and fid.max() >= 0
        assert "rendered_depth" in new_meta["frame_modalities"]


if __name__ == "__main__":
    pytest.main([__file__, "-q", "-x"])
