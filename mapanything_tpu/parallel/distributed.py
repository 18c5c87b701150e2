"""Multi-host initialization and cross-process helpers.

Parity: the reference's NCCL/torchrun plumbing
(``mapanything/utils/train_tools.py:362-403``: init_process_group from
RANK/WORLD_SIZE env, barriers, EFA tuning). On TPU pods this collapses to
``jax.distributed.initialize()`` — process discovery and ICI/DCN wiring
are automatic; everything below is convenience around it.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def init_distributed_mode(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> dict:
    """Initialize multi-host JAX; degrade gracefully single-host.

    Mirrors the reference's graceful fallback ("Not using distributed
    mode", train_tools.py:375-384): when no coordinator/cluster env is
    present, returns single-process info without error.

    Returns {"world_size", "rank", "local_devices", "distributed"}.
    """
    has_cluster_env = any(
        k in os.environ
        for k in (
            "COORDINATOR_ADDRESS",
            "MEGASCALE_COORDINATOR_ADDRESS",
            "TPU_WORKER_HOSTNAMES" if os.environ.get("TPU_WORKER_HOSTNAMES", "localhost") != "localhost" else "_",
        )
    )
    if coordinator_address or has_cluster_env:
        try:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
        except (RuntimeError, ValueError) as e:  # already initialized / no cluster
            if "already" not in str(e):
                print(f"distributed init skipped: {e}")

    info = {
        "world_size": jax.process_count(),
        "rank": jax.process_index(),
        "local_devices": jax.local_device_count(),
        "distributed": jax.process_count() > 1,
    }
    if not info["distributed"]:
        print("Not using distributed mode")
    return info


def barrier(name: str = "barrier"):
    """Cross-process sync point (reference torch.distributed.barrier)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)
