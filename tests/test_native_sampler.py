"""Native C++ covisibility sampler: build, correctness, speed."""

import time

import numpy as np
import pytest

from mapanything_tpu.native import covis_random_walk_native, get_lib


def chain_covis(n, width=2):
    covis = np.zeros((n, n), np.float32)
    for i in range(n):
        for j in range(max(0, i - width), min(n, i + width + 1)):
            covis[i, j] = 100.0 if i != j else 200.0
    return covis


@pytest.fixture(scope="module")
def lib():
    lib = get_lib()
    if lib is None:
        pytest.skip("g++ unavailable; native sampler not built")
    return lib


class TestNativeSampler:
    def test_samples_connected_subgraph(self, lib):
        covis = chain_covis(64)
        out = covis_random_walk_native(covis, 0.25, 16, seed=7)
        assert out is not None and len(out) == 16
        assert len(set(out.tolist())) == 16
        # chain graph: sampled set must be contiguous within width 2
        s = np.sort(out)
        assert np.all(np.diff(s) <= 2)

    def test_handles_disconnected_graph(self, lib):
        # two components of 8; ask for 12 -> best walk is 8
        covis = np.zeros((16, 16), np.float32)
        covis[:8, :8] = chain_covis(8)
        covis[8:, 8:] = chain_covis(8)
        out = covis_random_walk_native(covis, 0.25, 12, seed=3)
        assert out is not None
        assert len(out) == 8
        comp = set(out.tolist())
        assert comp <= set(range(8)) or comp <= set(range(8, 16))

    def test_deterministic_for_seed(self, lib):
        covis = chain_covis(32)
        a = covis_random_walk_native(covis, 0.25, 10, seed=42)
        b = covis_random_walk_native(covis, 0.25, 10, seed=42)
        np.testing.assert_array_equal(a, b)
        c = covis_random_walk_native(covis, 0.25, 10, seed=43)
        assert not np.array_equal(a, c)

    def test_faster_than_python(self, lib):
        from mapanything_tpu.data.base_dataset import BaseDataset

        covis = chain_covis(1500, width=8)

        class D(BaseDataset):
            def __len__(self):
                return 1

            def _get_views(self, *a):
                raise NotImplementedError

        ds = D(num_views=4, resolution=(32, 32), covisibility_thres=0.25, seed=0)
        ds._rng = np.random.default_rng(0)

        t0 = time.perf_counter()
        for _ in range(5):
            ds.use_native_sampler = False
            py = ds._random_walk_sampling(covis, 64)
        t_py = time.perf_counter() - t0

        t0 = time.perf_counter()
        for _ in range(5):
            out = covis_random_walk_native(covis, 0.25, 64, seed=1)
        t_cpp = time.perf_counter() - t0

        assert len(py) == 64 and len(out) == 64
        assert t_cpp < t_py, f"native {t_cpp:.4f}s not faster than python {t_py:.4f}s"

    def test_dataset_uses_native_path(self, lib):
        from test_data_layer import make_ds

        ds = make_ds()
        ds.use_native_sampler = True
        views = ds[(0, 0)]
        assert len(views) == 4


if __name__ == "__main__":
    pytest.main([__file__, "-q", "-x"])
