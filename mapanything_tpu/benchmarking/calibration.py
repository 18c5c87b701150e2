"""Single-view calibration benchmark: ray-direction angular error.

Parity: ``benchmarking/calibration/benchmark.py`` (:33,161,216-228):
run single-view inference, compare predicted unit ray directions against
GT rays derived from the calibrated intrinsics; report the mean angular
error in degrees per scene.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def compute_calibration_metrics(gt_ray_directions, pred_ray_directions) -> float:
    """Mean angular error (deg) between unit-ray maps (reference :216)."""
    from mapanything_tpu.utils.metrics import ray_angular_error_deg

    l2 = np.linalg.norm(
        np.asarray(gt_ray_directions) - np.asarray(pred_ray_directions), axis=-1
    )
    return float(np.mean(ray_angular_error_deg(l2)))


def run_benchmark(model, params, data_loader, max_batches=None) -> Dict[str, float]:
    """Loop single-view batches; aggregate per-scene ray errors (:161)."""
    import jax
    import jax.numpy as jnp

    from mapanything_tpu.models.mapanything import Views

    fwd = jax.jit(lambda p, v: model.apply(p, v))
    per_scene: Dict[str, list] = {}

    for i, batch_np in enumerate(data_loader):
        if max_batches is not None and i >= max_batches:
            break
        img = jnp.asarray(batch_np["img"][:, :1])  # single view
        preds = fwd(params, Views(img=img))
        err = compute_calibration_metrics(
            batch_np["ray_directions_cam"][:, 0],
            np.asarray(preds.ray_directions)[:, 0],
        )
        labels = batch_np.get("label", [f"scene_{i}"])
        for label in np.atleast_1d(labels):
            per_scene.setdefault(str(label), []).append(err)

    summary = {scene: float(np.mean(v)) for scene, v in per_scene.items()}
    summary["overall"] = float(np.mean(list(summary.values())))
    return summary
