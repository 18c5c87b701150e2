"""Metric logging: windowed smoothing, cross-process sync, JSON-lines logs.

Parity: ``mapanything/utils/train_tools.py`` MetricLogger / SmoothedValue
(:34-274, window median/avg + distributed sync), rank-aware printing
(:276-297), and the per-epoch JSON-lines ``log.txt``
(training.py:167-193). Cross-process reduction uses
``jax.experimental.multihost_utils`` instead of torch.distributed.
"""

from __future__ import annotations

import datetime
import json
import time
from collections import defaultdict, deque
from pathlib import Path
from typing import Dict, Optional

import numpy as np


class SmoothedValue:
    """Track a series with window median/avg and global stats (:34)."""

    def __init__(self, window_size: int = 20, fmt: str = "{median:.4f} ({global_avg:.4f})"):
        self.deque = deque(maxlen=window_size)
        self.total = 0.0
        self.count = 0
        self.fmt = fmt

    def update(self, value, n: int = 1):
        self.deque.append(float(value))
        self.count += n
        self.total += float(value) * n

    @property
    def median(self):
        return float(np.median(self.deque)) if self.deque else 0.0

    @property
    def avg(self):
        return float(np.mean(self.deque)) if self.deque else 0.0

    @property
    def global_avg(self):
        return self.total / max(self.count, 1)

    @property
    def max(self):
        return max(self.deque) if self.deque else 0.0

    @property
    def value(self):
        return self.deque[-1] if self.deque else 0.0

    def __str__(self):
        return self.fmt.format(
            median=self.median, avg=self.avg, global_avg=self.global_avg,
            max=self.max, value=self.value,
        )


def all_reduce_mean(x: float) -> float:
    """Cross-process scalar mean (train_tools.py:630)."""
    import jax

    if jax.process_count() == 1:
        return float(x)
    from jax.experimental import multihost_utils

    arr = multihost_utils.process_allgather(np.asarray(x, np.float32))
    return float(np.mean(arr))


class MetricLogger:
    """Iteration logger with smoothing + ETA printing (:98-274)."""

    def __init__(self, delimiter: str = "  ", print_fn=print):
        self.meters: Dict[str, SmoothedValue] = defaultdict(SmoothedValue)
        self.delimiter = delimiter
        self.print_fn = print_fn

    def update(self, **kwargs):
        for k, v in kwargs.items():
            self.meters[k].update(float(v))

    def __getattr__(self, attr):
        if attr in ("meters", "delimiter", "print_fn"):
            raise AttributeError(attr)
        if attr in self.meters:
            return self.meters[attr]
        raise AttributeError(attr)

    def __str__(self):
        return self.delimiter.join(
            f"{name}: {meter}" for name, meter in self.meters.items()
        )

    def log_every(self, iterable, print_freq: int, header: str = ""):
        i = 0
        start_time = time.time()
        end = time.time()
        iter_time = SmoothedValue(fmt="{avg:.4f}")
        data_time = SmoothedValue(fmt="{avg:.4f}")
        total = len(iterable) if hasattr(iterable, "__len__") else None
        for obj in iterable:
            data_time.update(time.time() - end)
            yield obj
            iter_time.update(time.time() - end)
            if i % print_freq == 0:
                if total:
                    eta = iter_time.global_avg * (total - i)
                    eta_str = str(datetime.timedelta(seconds=int(eta)))
                    self.print_fn(
                        f"{header} [{i}/{total}] eta: {eta_str} {self} "
                        f"time: {iter_time} data: {data_time}"
                    )
                else:
                    self.print_fn(f"{header} [{i}] {self} time: {iter_time}")
            i += 1
            end = time.time()
        elapsed = time.time() - start_time
        self.print_fn(
            f"{header} Total time: {datetime.timedelta(seconds=int(elapsed))}"
        )

    def global_avg_dict(self, prefix: str = "") -> Dict[str, float]:
        return {f"{prefix}{k}": m.global_avg for k, m in self.meters.items()}


class JsonlLogger:
    """Append-per-epoch JSON-lines log (training.py:167-193)."""

    def __init__(self, output_dir: str, filename: str = "log.txt", enabled: bool = True):
        self.enabled = enabled
        self.path = Path(output_dir) / filename
        if enabled:
            self.path.parent.mkdir(parents=True, exist_ok=True)

    def write(self, stats: dict):
        if not self.enabled:
            return
        with open(self.path, "a") as f:
            f.write(json.dumps(stats) + "\n")


def is_main_process() -> bool:
    import jax

    return jax.process_index() == 0


def print_main(*args, **kwargs):
    """Rank-aware print (train_tools.py:276-297)."""
    if is_main_process():
        print(*args, **kwargs)
