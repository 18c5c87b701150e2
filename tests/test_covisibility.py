"""Offline covisibility computation tests."""

import numpy as np
import pytest

from mapanything_tpu.data_processing.covisibility import (
    compute_pairwise_covisibility,
    write_covisibility,
)


def make_scene(V=4, H=24, W=32, offset=0.3):
    """Cameras translated along x viewing a plane at z=4."""
    K = np.array([[40.0, 0, W / 2 - 0.5], [0, 40.0, H / 2 - 0.5], [0, 0, 1]], np.float32)
    depths = np.full((V, H, W), 4.0, np.float32)
    poses = np.tile(np.eye(4, dtype=np.float32), (V, 1, 1))
    for v in range(V):
        poses[v, 0, 3] = v * offset
    Ks = np.tile(K, (V, 1, 1))
    return depths, Ks, poses


class TestCovisibility:
    def test_self_covisibility_is_one(self):
        depths, Ks, poses = make_scene()
        covis = compute_pairwise_covisibility(depths, Ks, poses)
        np.testing.assert_allclose(np.diagonal(covis), 1.0, atol=1e-3)

    def test_decreases_with_baseline(self):
        depths, Ks, poses = make_scene(V=4, offset=1.0)
        covis = compute_pairwise_covisibility(depths, Ks, poses)
        # farther-away pairs overlap less
        assert covis[0, 1] > covis[0, 2] > covis[0, 3]
        assert covis[0, 1] > 0.5

    def test_disjoint_views_zero(self):
        depths, Ks, poses = make_scene(V=2)
        poses[1, :3, :3] = np.diag([-1.0, 1.0, -1.0])  # face backwards
        covis = compute_pairwise_covisibility(depths, Ks, poses)
        assert covis[0, 1] < 1e-3 and covis[1, 0] < 1e-3

    def test_write_layout_readable_by_dataset_io(self, tmp_path):
        from mapanything_tpu.data.wai import load_covisibility

        depths, Ks, poses = make_scene()
        covis = compute_pairwise_covisibility(depths, Ks, poses)
        write_covisibility(tmp_path, covis)
        loaded = load_covisibility(tmp_path)
        np.testing.assert_allclose(np.asarray(loaded), covis)


if __name__ == "__main__":
    pytest.main([__file__, "-q", "-x"])
