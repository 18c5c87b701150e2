"""Context parallelism: many-view inference sharded over the view axis.

The reference handles long token counts on a single GPU (SURVEY.md 2.5 —
full attention + minibatched heads, model.py:1440-1618). The TPU-native
answer is true context parallelism: shard the view axis of every (B, V, ...)
array over the mesh's "view" axis and jit the forward under the mesh —
XLA's SPMD partitioner keeps frame-attention layers fully local and lowers
the global-attention layers to all-gather-KV over ICI (the per-shard
queries attend to gathered keys/values; O(V*P) memory per chip for KV but
O(V*P/n) for activations). A Pallas ring-attention kernel that streams KV
shards with overlapping RDMA (see ops/flash_attention.py) is the planned
upgrade for >500-view scale.

View-order legality: views are order-equivariant except view 0 (reference
alternating_attention_transformer.py:296-323), so block-sharding V is
semantics-preserving as long as shard 0 holds view 0 — which block
sharding guarantees.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mapanything_tpu.models.mapanything import MapAnything, Views
from mapanything_tpu.parallel.cp import (  # noqa: F401  (public re-exports)
    CPContext,
    context_parallel_attention,
    current_cp,
)
from mapanything_tpu.parallel.mesh import DATA_AXIS, VIEW_AXIS


def shard_views(views: Views, mesh: Mesh) -> Views:
    """Place a Views pytree with (data, view) sharding on the mesh."""
    bv = NamedSharding(mesh, P(DATA_AXIS, VIEW_AXIS))
    b = NamedSharding(mesh, P(DATA_AXIS))

    def put(x):
        if x is None:
            return None
        return jax.device_put(x, bv if x.ndim >= 2 else b)

    return jax.tree.map(put, views)


def infer_view_sharded(
    model: MapAnything,
    params,
    views: Views,
    mesh: Mesh,
    donate: bool = False,
):
    """Jit + run the forward with views sharded across the mesh.

    The returned Predictions stay sharded (B over data, V over view); pull
    shards to host with jax.device_get as needed.
    """
    params = jax.device_put(params, NamedSharding(mesh, P()))
    views = shard_views(views, mesh)

    @jax.jit
    def fwd(params, views):
        return model.apply(params, views)

    with mesh:
        return fwd(params, views)


def max_views_per_chip_estimate(
    image_hw, patch_size: int = 14, head_chunk: int = 1, hbm_bytes: int = 16 << 30
) -> int:
    """Rough static analogue of the reference's adaptive minibatch sizing
    (model.py:1440-1477, 680 MB/view-sample at 518 px): estimate how many
    views fit per chip given activation footprints at this resolution."""
    h, w = image_hw
    scale = (h * w) / (518 * 518)
    per_view = int(680e6 * scale / max(head_chunk, 1))
    budget = int(hbm_bytes * 0.6)
    return max(1, budget // max(per_view, 1))
