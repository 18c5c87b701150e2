"""Tracing/profiling: block timers + jax.profiler wrappers.

Parity: ``mapanything/utils/timing.py:16,40,139`` (BlockTimer /
BlockTimeManager context-decorator timers with windowed stats) and
``uniception/utils/profile.py`` (benchmark wrappers). TPU additions:
``trace`` wraps ``jax.profiler`` for Perfetto traces and ``time_jitted``
measures steady-state latency with ``block_until_ready``.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict, deque
from typing import Callable, Dict, Optional


class BlockTimer:
    """Context manager / decorator measuring wall time with window stats."""

    def __init__(self, name: str = "block", window: int = 50, print_fn=None):
        self.name = name
        self.window = deque(maxlen=window)
        self.total = 0.0
        self.count = 0
        self.print_fn = print_fn

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self.window.append(dt)
        self.total += dt
        self.count += 1
        if self.print_fn:
            self.print_fn(f"[{self.name}] {dt * 1e3:.2f} ms (avg {self.avg * 1e3:.2f})")
        return False

    def __call__(self, fn: Callable) -> Callable:
        def wrapped(*args, **kwargs):
            with self:
                return fn(*args, **kwargs)

        return wrapped

    @property
    def avg(self) -> float:
        return sum(self.window) / max(len(self.window), 1)

    @property
    def global_avg(self) -> float:
        return self.total / max(self.count, 1)


class BlockTimeManager:
    """Named-timer registry (reference timing.py:139)."""

    def __init__(self):
        self.timers: Dict[str, BlockTimer] = defaultdict(BlockTimer)

    def __call__(self, name: str) -> BlockTimer:
        if name not in self.timers:
            self.timers[name] = BlockTimer(name)
        return self.timers[name]

    def summary(self) -> Dict[str, float]:
        return {k: t.global_avg for k, t in self.timers.items()}


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax_trace"):
    """jax.profiler trace context (view with Perfetto/TensorBoard)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def time_jitted(fn: Callable, *args, iters: int = 10, warmup: int = 2) -> float:
    """Steady-state seconds/call of a jitted function (blocks on results)."""
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters
