"""Device mesh construction and sharding rules.

The reference's only parallelism is NCCL DDP (train_tools.py:362-403);
here scaling is a 2-D ``jax.sharding.Mesh`` with axes:

  - ``data``: batch-parallel (the DDP replacement; gradients all-reduce
    implicitly through pjit's sharding propagation over ICI);
  - ``view``: context parallelism over the view axis — the TPU-native
    answer to the reference's single-GPU global attention over V*H*W
    tokens (SURVEY.md section 2.5). Frame-attention layers are local to a
    shard; global-attention layers all-gather KV over ICI.

Multi-host: ``jax.distributed.initialize()`` + the same mesh spanning all
processes; no explicit process-group plumbing.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
VIEW_AXIS = "view"


def make_mesh(
    devices: Optional[Sequence] = None,
    view_parallelism: int = 1,
    axis_names=(DATA_AXIS, VIEW_AXIS),
) -> Mesh:
    """Build a (data, view) mesh over the given (or all) devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    assert n % view_parallelism == 0, (
        f"{n} devices not divisible by view_parallelism={view_parallelism}"
    )
    arr = np.asarray(devices).reshape(n // view_parallelism, view_parallelism)
    return Mesh(arr, axis_names)


def views_sharding(mesh: Mesh) -> NamedSharding:
    """Shard (B, V, ...) arrays: batch over data, views over view axis."""
    return NamedSharding(mesh, P(DATA_AXIS, VIEW_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard (B, ...) arrays over the data axis only."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_views_pytree(pytree, mesh: Mesh):
    """Apply (data, view) sharding to every (B, V, ...) array in a pytree."""
    bv = views_sharding(mesh)
    b = batch_sharding(mesh)
    rep = replicated(mesh)

    def put(x):
        if x is None:
            return None
        if x.ndim >= 2:
            return jax.device_put(x, bv)
        if x.ndim == 1:
            return jax.device_put(x, b)
        return jax.device_put(x, rep)

    return jax.tree.map(put, pytree)
