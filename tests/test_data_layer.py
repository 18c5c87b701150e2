"""Data-layer tests: sampling, cropping, collation, loaders, DSL."""

import numpy as np
import pytest

from mapanything_tpu.data.base_dataset import (
    BaseDataset,
    collate_views,
    pointmaps_and_rays_from_depth,
)
from mapanything_tpu.data.cropping import crop_resize_if_necessary
from mapanything_tpu.data.easy_dataset import CatDataset
from mapanything_tpu.data.loader import MultiViewDataLoader, get_test_data_loader
from mapanything_tpu.data.samplers import (
    BatchedRandomSampler,
    DynamicBatchedMultiFeatureRandomSampler,
)


class SyntheticScenes(BaseDataset):
    """In-memory random-geometry scenes for tests."""

    is_metric_scale = True
    is_synthetic = True

    def __init__(self, n_scenes=6, frames_per_scene=12, **kwargs):
        super().__init__(**kwargs)
        self.n_scenes = n_scenes
        self.frames = frames_per_scene
        base = np.random.RandomState(42)
        # covisibility: chain structure, each frame sees +-2 neighbors
        self.covis = np.zeros((frames_per_scene, frames_per_scene), np.float32)
        for i in range(frames_per_scene):
            for j in range(max(0, i - 2), min(frames_per_scene, i + 3)):
                self.covis[i, j] = 100.0 if i != j else 200.0
        self.base_seed = base.randint(0, 1 << 30)

    def __len__(self):
        return self.n_scenes

    def _get_views(self, idx, num_views, resolution):
        rng = np.random.RandomState(self.base_seed + idx)
        view_ids = self._sample_view_indices(num_views, self.frames, self.covis)
        views = []
        h0, w0 = 96, 128
        for vid in view_ids:
            r = np.random.RandomState(self.base_seed + idx * 1000 + int(vid))
            img = r.randint(0, 255, (h0, w0, 3), np.uint8)
            depth = r.uniform(1.0, 5.0, (h0, w0)).astype(np.float32)
            K = np.array(
                [[100.0, 0, w0 / 2 - 0.5], [0, 100.0, h0 / 2 - 0.5], [0, 0, 1]],
                np.float32,
            )
            pose = np.eye(4, dtype=np.float32)
            pose[:3, 3] = r.randn(3)
            img, depth, K, _ = self._crop_resize_if_necessary(
                img, resolution, depth, K
            )
            views.append(
                dict(
                    img=img, depthmap=depth, camera_pose=pose,
                    camera_intrinsics=K, dataset="Synthetic",
                    label=f"scene{idx}", instance=str(vid),
                )
            )
        return views


def make_ds(**kw):
    defaults = dict(
        num_views=4, split="train", covisibility_thres=0.25,
        resolution=(64, 48), seed=7,
    )
    defaults.update(kw)
    return SyntheticScenes(**defaults)


class TestGeometryDerivation:
    def test_pointmaps_consistent(self):
        rng = np.random.RandomState(0)
        depth = rng.uniform(1, 3, (24, 32)).astype(np.float32)
        K = np.array([[50.0, 0, 15.5], [0, 50.0, 11.5], [0, 0, 1]], np.float32)
        pose = np.eye(4, dtype=np.float32)
        pose[:3, 3] = [1, 2, 3]
        geo = pointmaps_and_rays_from_depth(depth, K, pose)
        # pts3d = pts3d_cam + t for identity rotation
        np.testing.assert_allclose(
            geo["pts3d"], geo["pts3d_cam"] + np.array([1, 2, 3]), atol=1e-5
        )
        # rays * depth_along_ray == pts3d_cam
        np.testing.assert_allclose(
            geo["ray_directions_cam"] * geo["depth_along_ray"],
            geo["pts3d_cam"], atol=1e-3,
        )


class TestCropping:
    def test_crop_resize_intrinsics(self):
        rng = np.random.RandomState(0)
        img = rng.randint(0, 255, (96, 128, 3), np.uint8)
        depth = rng.uniform(1, 5, (96, 128)).astype(np.float32)
        K = np.array([[100.0, 0, 63.5], [0, 100.0, 47.5], [0, 0, 1]], np.float32)
        out_img, out_depth, out_K, _ = crop_resize_if_necessary(
            img, (64, 48), depth, K
        )
        assert out_img.shape == (48, 64, 3)
        assert out_depth.shape == (48, 64)
        # principal point should stay near center
        assert abs(out_K[0, 2] - 31.5) < 1.5 and abs(out_K[1, 2] - 23.5) < 1.5
        # focal scaled by 0.5
        assert abs(out_K[0, 0] - 50.0) < 1.0


class TestDataset:
    def test_getitem_structure(self):
        ds = make_ds()
        views = ds[(0, 0)]
        assert len(views) == 4
        v = views[0]
        assert v["img"].shape == (48, 64, 3)
        assert v["pts3d"].shape == (48, 64, 3)
        assert v["depth_along_ray"].shape == (48, 64, 1)
        assert v["camera_pose_quats"].shape == (4,)
        assert v["valid_mask"].dtype == bool

    def test_deterministic_with_seed(self):
        ds = make_ds()
        a = ds[(2, 0)]
        b = ds[(2, 0)]
        np.testing.assert_array_equal(a[0]["img"], b[0]["img"])
        assert [v["instance"] for v in a] == [v["instance"] for v in b]

    def test_random_walk_connectivity(self):
        ds = make_ds()
        ds._rng = np.random.default_rng(0)
        idx = ds._random_walk_sampling(ds.covis, 6)
        assert len(idx) == 6
        assert len(set(idx.tolist())) == 6
        # chain covisibility: consecutive walk nodes within +-2
        sorted_idx = np.sort(idx)
        assert np.all(np.diff(sorted_idx) <= 2)

    def test_collate_shapes(self):
        ds = make_ds()
        batch = collate_views([ds[(0, 0)], ds[(1, 0)]])
        assert batch["img"].shape == (2, 4, 48, 64, 3)
        assert batch["valid_mask"].shape == (2, 4, 48, 64)
        assert batch["camera_pose_quats"].shape == (2, 4, 4)
        assert batch["is_metric_scale"].shape == (2,)


class TestEasyDatasetDSL:
    def test_mul_repeat(self):
        ds = make_ds()
        ds3 = 3 * ds
        assert len(ds3) == 3 * len(ds)
        a = ds3[(0, 0)]
        b = ds3[(1, 0)]
        assert a[0]["label"] == b[0]["label"]  # same underlying scene

    def test_resize_resample(self):
        ds = make_ds()
        big = 20 @ ds
        assert len(big) == 20
        views = big[(15, 0)]
        assert len(views) == 4

    def test_cat(self):
        d1, d2 = make_ds(), make_ds()
        cat = d1 + d2
        assert isinstance(cat, CatDataset)
        assert len(cat) == len(d1) + len(d2)
        v = cat[(len(d1) + 1, 0)]
        assert len(v) == 4


class TestSamplers:
    def test_batched_random_sampler_same_feature_per_batch(self):
        ds = make_ds()
        s = BatchedRandomSampler(ds, batch_size=3, pool_size=5)
        s.set_epoch(0)
        idxs = list(s)
        feats = [f for _, f in idxs]
        for i in range(0, len(feats) - 2, 3):
            assert feats[i] == feats[i + 1] == feats[i + 2]

    def test_dynamic_sampler_batch_size_scales(self):
        ds = 10 @ make_ds(num_views=6, variable_num_views=True)
        bs_map = {i: max(1, 12 // (i + 2)) for i in range(5)}
        s = DynamicBatchedMultiFeatureRandomSampler(
            ds, pool_sizes=[1, 5], scaling_feature_idx=1,
            feature_to_batch_size_map=bs_map,
        )
        s.set_epoch(0)
        for batch in s:
            nv_idx = batch[0][2]
            assert len(batch) == bs_map[nv_idx]
            assert all(t[2] == nv_idx for t in batch)
            break

    def test_distributed_disjoint(self):
        ds = make_ds()
        all_seen = []
        for rank in range(2):
            s = BatchedRandomSampler(ds, 2, 3, world_size=2, rank=rank)
            s.set_epoch(1)
            all_seen.append([i for i, _ in s])
        assert not (set(all_seen[0]) & set(all_seen[1])) or (
            len(all_seen[0]) + len(all_seen[1]) <= len(ds) + 4
        )


class TestLoaders:
    def test_train_loader_yields_batches(self):
        ds = 12 @ make_ds(num_views=4, variable_num_views=True)
        loader = MultiViewDataLoader(ds, images_per_batch=8, num_workers=2)
        loader.set_epoch(0)
        it = iter(loader)
        batch = next(it)
        b, v = batch["img"].shape[:2]
        assert b * v <= 8 + v  # images-per-batch budget
        assert batch["pts3d"].shape[2:] == (48, 64, 3)

    def test_test_loader(self):
        ds = make_ds()
        loader = get_test_data_loader(ds, batch_size=2)
        loader.set_epoch(0)
        batch = next(iter(loader))
        assert batch["img"].shape[0] == 2


if __name__ == "__main__":
    pytest.main([__file__, "-q", "-x"])


class TestColorTransforms:
    def test_imgnorm_is_identity(self):
        import numpy as np
        from mapanything_tpu.data.transforms import apply_color_transform

        rng = np.random.default_rng(0)
        img = rng.uniform(size=(16, 16, 3)).astype(np.float32)
        out = apply_color_transform(img, "imgnorm", rng)
        np.testing.assert_array_equal(out, img)

    def test_colorjitter_bounded_and_deterministic(self):
        import numpy as np
        from mapanything_tpu.data.transforms import apply_color_transform

        img = np.random.default_rng(1).uniform(size=(16, 16, 3)).astype(np.float32)
        a = apply_color_transform(img, "colorjitter", np.random.default_rng(7))
        b = apply_color_transform(img, "colorjitter", np.random.default_rng(7))
        np.testing.assert_array_equal(a, b)
        assert a.min() >= 0.0 and a.max() <= 1.0
        assert not np.array_equal(a, img)

    def test_full_aug_stack_runs(self):
        import numpy as np
        from mapanything_tpu.data.transforms import (
            apply_color_transform,
            gaussian_blur,
            to_grayscale,
        )

        img = np.random.default_rng(2).uniform(size=(15, 17, 3)).astype(np.float32)
        for seed in range(8):  # exercises all random branches
            out = apply_color_transform(
                img, "colorjitter+grayscale+gaublur", np.random.default_rng(seed)
            )
            assert out.shape == img.shape and np.isfinite(out).all()
        g = to_grayscale(img)
        assert np.allclose(g[..., 0], g[..., 1])
        bl = gaussian_blur(img, sigma=0.8)
        assert bl.var() < img.var()

    def test_hue_shift_full_turn_identity(self):
        import numpy as np
        from mapanything_tpu.data.transforms import adjust_hue

        img = np.random.default_rng(3).uniform(size=(8, 8, 3)).astype(np.float32)
        out = adjust_hue(adjust_hue(img, 0.25), -0.25)
        np.testing.assert_allclose(out, img, atol=1e-5)
