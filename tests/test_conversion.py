"""Tests for the raw->WAI conversion subsystem, EXR IO, and splits."""

import json
import os
from pathlib import Path

import numpy as np
import pytest

from mapanything_tpu.data import wai as wai_io
from mapanything_tpu.data.splits import (
    HexMod10Rule,
    NamedValTestRule,
    PathPrefixRule,
    SeededFractionRule,
    split_scenes,
)
from mapanything_tpu.data_processing.conversion import (
    convert_scenes,
    get_adapter,
    get_processing_state,
    ADAPTERS,
)
from mapanything_tpu.data_processing.conversion import formats as F
from mapanything_tpu.utils.exr import read_depth_exr, write_depth_exr


class TestExr:
    def test_roundtrip(self, tmp_path):
        depth = np.random.RandomState(0).rand(37, 53).astype(np.float32) * 10
        p = tmp_path / "d.exr"
        write_depth_exr(p, depth)
        out = read_depth_exr(p)
        np.testing.assert_array_equal(out, depth)

    def test_load_depth_fallback(self, tmp_path):
        depth = np.random.RandomState(1).rand(8, 6).astype(np.float32)
        p = tmp_path / "d.exr"
        write_depth_exr(p, depth)
        out = wai_io.load_depth(p)
        np.testing.assert_array_equal(out, depth)

    def test_rejects_non_exr(self, tmp_path):
        p = tmp_path / "x.exr"
        p.write_bytes(b"not an exr file at all")
        with pytest.raises(ValueError):
            read_depth_exr(p)


class TestFormats:
    def test_pfm_roundtrip(self, tmp_path):
        data = np.random.RandomState(0).rand(5, 7).astype("<f4")
        p = tmp_path / "d.pfm"
        with open(p, "wb") as f:
            f.write(b"Pf\n7 5\n-1.0\n")
            f.write(data[::-1].tobytes())  # PFM stores bottom-up
        out = F.read_pfm(p)
        np.testing.assert_allclose(out, data)

    def test_disparity_to_depth(self):
        disp = np.array([[2.0, 0.0], [4.0, 1e-9]], np.float32)
        depth = F.disparity_to_depth(disp, focal_px=100.0, baseline_m=0.5)
        assert depth[0, 0] == pytest.approx(25.0)
        assert depth[1, 0] == pytest.approx(12.5)
        assert depth[0, 1] == 0.0  # zero disparity invalid

    def test_w2c_roundtrip(self):
        rng = np.random.RandomState(0)
        q = rng.randn(4)
        R = F.quat_xyzw_to_matrix(q)
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)
        w2c = np.eye(4)
        w2c[:3, :3] = R
        w2c[:3, 3] = rng.randn(3)
        np.testing.assert_allclose(
            F.w2c_to_c2w(w2c) @ w2c, np.eye(4), atol=1e-12
        )

    def test_gl2cv_is_involution(self):
        rng = np.random.RandomState(0)
        pose = np.eye(4)
        pose[:3, :3] = F.quat_xyzw_to_matrix(rng.randn(4))
        pose[:3, 3] = rng.randn(3)
        np.testing.assert_allclose(
            F.gl2cv_pose(F.gl2cv_pose(pose)), pose, atol=1e-12
        )

    def test_pytorch3d_ndc_camera(self):
        # Identity-centred NDC camera -> principal point at image centre.
        vp = {
            "focal_length": [2.0, 2.0],
            "principal_point": [0.0, 0.0],
            "R": np.eye(3).tolist(),
            "T": [0.0, 0.0, 0.0],
        }
        K, c2w = F.pytorch3d_ndc_camera_to_opencv(vp, (64, 48))
        assert K[0, 2] == pytest.approx(32.0)
        assert K[1, 2] == pytest.approx(24.0)
        assert K[0, 0] == pytest.approx(2.0 * 24.0)  # min half-size
        assert np.isfinite(c2w).all()

    def test_axis_angle(self):
        v = np.array([0.0, 0.0, np.pi / 2])
        R = F.axis_angle_to_matrix(v)
        np.testing.assert_allclose(
            R @ np.array([1.0, 0, 0]), [0.0, 1.0, 0.0], atol=1e-12
        )
        np.testing.assert_allclose(
            F.axis_angle_to_matrix([0, 0, 0]), np.eye(3)
        )


def _write_png(path, rng, h=12, w=16):
    import cv2

    img = rng.randint(0, 255, (h, w, 3), np.uint8)
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    cv2.imwrite(str(path), img)
    return img


def _make_blendedmvs_raw(root, n_scenes=2, n_frames=3):
    """Synthetic raw BlendedMVS layout (PFM depth + cam.txt)."""
    rng = np.random.RandomState(0)
    for s in range(n_scenes):
        scene = Path(root) / f"{s:024x}"
        (scene / "cams").mkdir(parents=True)
        (scene / "rendered_depth_maps").mkdir()
        (scene / "blended_images").mkdir()
        for i in range(n_frames):
            n = f"{i:08d}"
            _write_png(scene / "blended_images" / f"{n}.jpg", rng)
            depth = rng.uniform(1, 5, (12, 16)).astype("<f4")
            with open(scene / "rendered_depth_maps" / f"{n}.pfm", "wb") as f:
                f.write(b"Pf\n16 12\n-1.0\n")
                f.write(depth[::-1].tobytes())
            K = np.array([[20.0, 0, 8], [0, 20.0, 6], [0, 0, 1]])
            w2c = np.eye(4)
            w2c[:3, 3] = [0.1 * i, 0, 0]
            lines = ["extrinsic"]
            lines += [" ".join(map(str, row)) for row in w2c]
            lines += ["", "intrinsic"]
            lines += [" ".join(map(str, row)) for row in K]
            (scene / "cams" / f"{n}_cam.txt").write_text("\n".join(lines))


def _make_tav2_raw(root, n_frames=3):
    rng = np.random.RandomState(1)
    scene = Path(root) / "TestEnv"
    for d in ("images", "depth", "camera_params", "poses"):
        (scene / d).mkdir(parents=True)
    for i in range(n_frames):
        n = f"{i:08d}_0"
        _write_png(scene / "images" / f"{n}.png", rng)
        write_depth_exr(
            scene / "depth" / f"{n}.exr",
            rng.uniform(1, 5, (12, 16)).astype(np.float32),
        )
        np.save(
            scene / "camera_params" / f"{n}.npy",
            np.array([[20.0, 0, 8], [0, 20.0, 6], [0, 0, 1]]),
        )
        pose = np.eye(4)
        pose[:3, 3] = [i * 0.2, 0, 0]
        np.save(scene / "poses" / f"{n}.npy", pose)


class TestConversion:
    def test_adapter_registry(self):
        assert len(ADAPTERS) == 15
        for name in (
            "ase", "blendedmvs", "co3d", "dl3dv", "dynamicreplica", "eth3d",
            "megadepth", "mpsd", "mvs_synth", "paralleldomain4d",
            "sailvos3d", "scannetppv2", "spring", "tav2_wb",
            "unrealstereo4k",
        ):
            assert name in ADAPTERS
        with pytest.raises(KeyError):
            get_adapter("nope")

    def test_blendedmvs_conversion(self, tmp_path):
        raw = tmp_path / "raw"
        out = tmp_path / "wai"
        _make_blendedmvs_raw(raw)
        adapter = get_adapter("blendedmvs")
        scenes = adapter.list_scenes(raw)
        assert len(scenes) == 2
        done = convert_scenes(adapter, raw, out, link_files=False)
        assert done == sorted(scenes)
        for scene in done:
            state = get_processing_state(out / scene)
            assert state["conversion"]["state"] == "finished"
            meta = wai_io.load_scene_meta(out / scene)
            assert meta["dataset_name"] == "blendedmvs"
            assert len(meta["frames"]) == 3
            fr = wai_io.load_frame(
                out / scene, meta["frames"][1]["frame_name"],
                ["image", "depth", "pose", "intrinsics"], meta=meta,
            )
            assert fr["image"].shape == (12, 16, 3)
            assert fr["depth"].shape == (12, 16)
            assert (fr["depth"] > 0).all()
            # w2c translation [0.1, 0, 0] -> c2w translation [-0.1, 0, 0]
            np.testing.assert_allclose(
                fr["pose"][:3, 3], [-0.1, 0, 0], atol=1e-6
            )

    def test_tav2_conversion_and_skip_finished(self, tmp_path):
        raw = tmp_path / "raw"
        out = tmp_path / "wai"
        _make_tav2_raw(raw)
        adapter = get_adapter("tav2_wb")
        done = convert_scenes(adapter, raw, out, link_files=False)
        assert done == ["TestEnv"]
        # second run skips (finished), no error
        done2 = convert_scenes(adapter, raw, out, link_files=False)
        assert done2 == ["TestEnv"]
        meta = wai_io.load_scene_meta(out / "TestEnv")
        fr = wai_io.load_frame(
            out / "TestEnv", meta["frames"][2]["frame_name"],
            ["depth", "pose"], meta=meta,
        )
        np.testing.assert_allclose(fr["pose"][:3, 3], [0.4, 0, 0], atol=1e-6)
        assert fr["depth"].shape == (12, 16)

    def test_failed_scene_recorded(self, tmp_path):
        raw = tmp_path / "raw"
        out = tmp_path / "wai"
        _make_blendedmvs_raw(raw, n_scenes=1)
        # corrupt one cam file
        scene = next(Path(raw).iterdir())
        (scene / "cams" / "00000001_cam.txt").write_text("garbage")
        done = convert_scenes(get_adapter("blendedmvs"), raw, out)
        assert done == []
        state = get_processing_state(out / scene.name)
        assert state["conversion"]["state"] == "failed"
        assert "Traceback" in state["conversion"]["message"]


class TestEndToEnd:
    def test_convert_covis_aggregate_load(self, tmp_path):
        from mapanything_tpu.data_processing.aggregate import (
            aggregate_dataset_metadata,
            list_converted_scenes,
        )
        from mapanything_tpu.data_processing.covisibility import (
            compute_pairwise_covisibility,
            write_covisibility,
        )

        raw, out, md = tmp_path / "raw", tmp_path / "wai", tmp_path / "md"
        _make_tav2_raw(raw, n_frames=4)
        convert_scenes(get_adapter("tav2_wb"), raw, out, link_files=False)

        scenes = list_converted_scenes(out)
        assert scenes == ["TestEnv"]
        meta = wai_io.load_scene_meta(out / "TestEnv")
        depths, Ks, poses = [], [], []
        for fr in meta["frames"]:
            d = wai_io.load_frame(
                out / "TestEnv", fr["frame_name"],
                ["depth", "intrinsics", "pose"], meta=meta,
            )
            depths.append(d["depth"])
            Ks.append(d["intrinsics"])
            poses.append(d["pose"])
        covis = compute_pairwise_covisibility(
            np.stack(depths), np.stack(Ks), np.stack(poses)
        )
        assert covis.shape == (4, 4)
        write_covisibility(out / "TestEnv", covis)

        splits = aggregate_dataset_metadata(
            "tav2_wb", out, md, with_adjacency=True
        )
        # TestEnv is not in any curated val/test list -> train
        assert splits["train"] == ["TestEnv"]
        lst = np.load(
            md / "train" / "tav2_wb_scene_list_train.npy", allow_pickle=True
        )
        assert list(lst) == ["TestEnv"]
        assert (md / "train" / "tav2_wb_aggregated_metadata_train.npz").exists()


class TestSplits:
    def test_hex_mod10(self):
        rule = HexMod10Rule()
        # low 16 hex digits "...a" -> 10 % 10 == 0 -> val
        assert rule.assign("00000000000000000000000a", []) == "val"
        assert rule.assign("000000000000000000000001", []) == "train"

    def test_named(self):
        rule = NamedValTestRule(val=("v1",), test=("t1",))
        assert rule.assign("v1", []) == "val"
        assert rule.assign("t1", []) == "test"
        assert rule.assign("x", []) == "train"

    def test_seeded_fraction_deterministic_partition(self):
        rule = SeededFractionRule(val_frac=0.2, test_frac=0.2, seed=7)
        scenes = [f"s{i}" for i in range(20)]
        a = [rule.assign(s, scenes) for s in scenes]
        b = [rule.assign(s, scenes) for s in scenes]
        assert a == b
        assert a.count("val") == 4 and a.count("test") == 4

    def test_path_prefix(self):
        rule = PathPrefixRule(val=("0013",))
        assert rule.assign("train/0001", []) == "train"
        assert rule.assign("train/0013", []) == "val"
        assert rule.assign("test/0003", []) == "test"

    def test_split_scenes_tav2(self):
        scenes = ["EndofTheWorld", "Supermarket", "SomeTrainEnv"]
        out = split_scenes("tav2_wb", scenes)
        assert out["val"] == ["EndofTheWorld"]
        assert out["test"] == ["Supermarket"]
        assert out["train"] == ["SomeTrainEnv"]


class TestVendoredReferenceSplits:
    """The benchmark-set scene lists must be byte-identical to the
    reference's enumerated data_splits.py (VERDICT r1 item 5)."""

    def test_blendedmvs_rule_reproduces_reference_lists(self):
        from mapanything_tpu.data.splits import (
            reference_split_lists,
            split_scenes,
        )

        lists = reference_split_lists()["blendedmvs"]
        got = split_scenes("blendedmvs", lists["all"])
        assert got["val"] == sorted(lists["val"])
        assert set(got["train"]) >= set(lists["train"])
        # hex-mod-10 fallback still governs ids outside the vendored set
        from mapanything_tpu.data.splits import assign_split

        assert assign_split("blendedmvs", "ffffffff0000000000000014", []) == "val"
        assert assign_split("blendedmvs", "ffffffff0000000000000015", []) == "train"

    def test_scannetppv2_vendored_lists(self):
        from mapanything_tpu.data.splits import (
            assign_split,
            reference_split_lists,
        )

        lists = reference_split_lists()["scannetppv2"]
        assert len(lists["val"]) == 30 and len(lists["test"]) == 30
        for s in lists["val"]:
            assert assign_split("scannetppv2", s, []) == "val"
        for s in lists["test"]:
            assert assign_split("scannetppv2", s, []) == "test"
        assert assign_split("scannetppv2", "not_a_scene", []) == "train"

    def test_tav2_and_eth3d(self):
        from mapanything_tpu.data.splits import (
            assign_split,
            reference_split_lists,
        )

        lists = reference_split_lists()["tav2_wb"]
        for s in lists["val"]:
            assert assign_split("tav2_wb", s, []) == "val"
        for s in lists["test"]:
            assert assign_split("tav2_wb", s, []) == "test"
        assert assign_split("eth3d", "anything", []) == "test"
