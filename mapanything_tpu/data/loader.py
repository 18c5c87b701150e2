"""Data loaders: batched sampling + parallel loading + device prefetch.

Parity: ``mapanything/datasets/__init__.py`` (get_test_data_loader :29,
many-AR test loader :65, get_train_data_loader :140 with the dynamic
batch sampler). torch DataLoader workers become a thread-pool prefetcher
(cv2/numpy release the GIL during decode; fork-based process pools are
available via ``num_workers``+``use_processes``), and H2D transfer overlaps
with compute via a simple double-buffered device prefetch.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ProcessPoolExecutor, ThreadPoolExecutor
from typing import Callable, Dict, Iterator, Optional

import numpy as np

from mapanything_tpu.data.base_dataset import collate_views
from mapanything_tpu.data.samplers import (
    BatchedMultiFeatureRandomSampler,
    DynamicBatchedMultiFeatureRandomSampler,
)


def default_images_per_device_budget(max_views: int, images_per_batch: int):
    """num-views -> batch size map keeping total images/device constant.

    Parity: the reference's images-per-GPU budget
    (DynamicBatchedMultiFeatureRandomSampler usage, datasets/__init__.py:140;
    e.g. 48 images/GPU: 24 views -> B=2, 4 views -> B=12).
    """

    def batch_size_for(num_views_idx: int) -> int:
        num_views = num_views_idx + 2  # feature idx 0 -> 2 views
        return max(1, images_per_batch // num_views)

    return batch_size_for


class Prefetcher:
    """Background batch loader with bounded prefetch queue."""

    def __init__(
        self,
        load_fn: Callable,
        index_iter: Iterator,
        num_workers: int = 4,
        prefetch: int = 4,
        use_processes: bool = False,
    ):
        self._load_fn = load_fn
        self._index_iter = index_iter
        self._queue: queue.Queue = queue.Queue(maxsize=prefetch)
        pool_cls = ProcessPoolExecutor if use_processes else ThreadPoolExecutor
        self._pool = pool_cls(max_workers=num_workers)
        self._thread = threading.Thread(target=self._feed, daemon=True)
        self._thread.start()

    def _feed(self):
        try:
            futures = []
            for batch_indices in self._index_iter:
                futures.append(self._pool.submit(self._load_fn, batch_indices))
                while len(futures) >= self._queue.maxsize:
                    self._queue.put(("ok", futures.pop(0).result()))
            for f in futures:
                self._queue.put(("ok", f.result()))
            self._queue.put(("end", None))
        except Exception as e:  # noqa: BLE001
            self._queue.put(("err", e))

    def __iter__(self):
        while True:
            kind, item = self._queue.get()
            if kind == "end":
                return
            if kind == "err":
                raise item
            yield item


class MultiViewDataLoader:
    """Train loader: dynamic batch sampler + parallel load + collate.

    Yields dicts of stacked (B, V, ...) numpy arrays (see
    ``base_dataset.collate_views``).
    """

    def __init__(
        self,
        dataset,
        images_per_batch: int = 8,
        num_workers: int = 4,
        world_size: int = 1,
        rank: int = 0,
        prefetch: int = 4,
    ):
        self.dataset = dataset
        num_ars = len(dataset._resolutions)
        if isinstance(dataset.num_views, int):
            num_nv = 1
            max_views = dataset.num_views
        else:
            num_nv = len(dataset.num_views)
            max_views = max(dataset.num_views)
        self.sampler = DynamicBatchedMultiFeatureRandomSampler(
            dataset,
            pool_sizes=[num_ars, num_nv],
            scaling_feature_idx=1,
            feature_to_batch_size_map=default_images_per_device_budget(
                max_views, images_per_batch
            ),
            world_size=world_size,
            rank=rank,
        )
        self.num_workers = num_workers
        self.prefetch = prefetch
        self.epoch = 0

    def __len__(self):
        return len(self.sampler)

    def set_epoch(self, epoch: int):
        self.epoch = epoch
        self.sampler.set_epoch(epoch)
        self.dataset.set_epoch(epoch)

    def _load_batch(self, batch_indices) -> Dict[str, np.ndarray]:
        samples = []
        for tup in batch_indices:
            if isinstance(self.dataset.num_views, int):
                idx = (tup[0], tup[1])
            else:
                idx = tup
            samples.append(self.dataset[idx])
        return collate_views(samples)

    def __iter__(self):
        return iter(
            Prefetcher(
                self._load_batch,
                iter(self.sampler),
                num_workers=self.num_workers,
                prefetch=self.prefetch,
            )
        )


def get_test_data_loader(
    dataset,
    batch_size: int,
    num_workers: int = 4,
    world_size: int = 1,
    rank: int = 0,
):
    """Fixed-batch test loader with per-batch shared AR (reference :29,:65)."""
    num_ars = len(dataset._resolutions)

    class _TestLoader:
        def __init__(self):
            self.sampler = BatchedMultiFeatureRandomSampler(
                dataset, batch_size, [num_ars], world_size=world_size, rank=rank
            )

        def __len__(self):
            return len(self.sampler) // batch_size

        def set_epoch(self, epoch):
            self.sampler.set_epoch(epoch)
            dataset.set_epoch(epoch)

        def __iter__(self):
            batch = []
            for tup in self.sampler:
                batch.append(dataset[tup])
                if len(batch) == batch_size:
                    yield collate_views(batch)
                    batch = []

    return _TestLoader()
