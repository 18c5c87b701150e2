"""Trace-time context-parallel attention state (leaf module).

Read by the trunk's global-attention layers (models/blocks.py) to route
through the explicit sharded schedules in parallel/sharded_attention.py.
Kept import-light: blocks.py imports this, and the model imports blocks.
"""

from __future__ import annotations

import contextlib
from dataclasses import dataclass
from typing import Optional

from jax.sharding import Mesh

from mapanything_tpu.parallel.mesh import VIEW_AXIS


@dataclass(frozen=True)
class CPContext:
    """Active context-parallel configuration for trunk global attention."""

    mesh: Mesh
    schedule: str = "allgather"  # or "ring" (the >200-view memory path)
    axis: str = VIEW_AXIS
    backend: Optional[str] = None  # None=auto, "einsum", "pallas[_interpret]"


_CP_STATE: Optional[CPContext] = None


def current_cp() -> Optional[CPContext]:
    return _CP_STATE


@contextlib.contextmanager
def context_parallel_attention(
    mesh: Mesh,
    schedule: str = "allgather",
    axis: str = VIEW_AXIS,
    backend: Optional[str] = None,
):
    """Route the trunk's global-attention layers through the explicit
    sharded schedules (parallel/sharded_attention.py) while tracing.

    Trace-time state: jit the forward INSIDE this context (a function
    already traced outside it will not re-trace). Build the model with
    ``MapAnythingConfig(context_parallel_trunk=True)`` so the trace
    differs structurally from the unsharded one.
    """
    global _CP_STATE
    prev = _CP_STATE
    _CP_STATE = CPContext(mesh=mesh, schedule=schedule, axis=axis, backend=backend)
    try:
        yield _CP_STATE
    finally:
        _CP_STATE = prev
