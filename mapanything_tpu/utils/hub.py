"""Model save/load in a hub-style layout (local directories).

Parity target: the reference's HF-hub integration
(``PyTorchModelHubMixin`` on the model class, model.py:96;
``from_pretrained("facebook/map-anything")``, README.md:124). This
environment has no network access, so the same API is provided over local
directories: ``save_pretrained(dir)`` writes config.json + orbax params;
``from_pretrained(dir)`` reconstructs the model and parameters. The
layout is also what ``scripts/convert_hf_to_benchmark_checkpoint``-style
tooling would emit after converting reference torch checkpoints with
``utils/torch_convert``.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Tuple

import orbax.checkpoint as ocp


def save_pretrained(model, params, directory) -> Path:
    """Write config.json + params/ (orbax) for a MapAnything model."""
    directory = Path(directory).absolute()
    directory.mkdir(parents=True, exist_ok=True)

    cfg = dataclasses.asdict(model.config)
    with open(directory / "config.json", "w") as f:
        json.dump({"model_type": "mapanything", "config": cfg}, f, indent=2, default=str)

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(directory / "params", params, force=True)
    ckptr.wait_until_finished()
    return directory


def from_pretrained(directory, params_template=None) -> Tuple[object, dict]:
    """Load (model, params) from a ``save_pretrained`` directory."""
    from mapanything_tpu.models.heads.adaptors import (
        ConfidenceConfig,
        DenseAdaptorConfig,
        PoseAdaptorConfig,
        QuatsConfig,
        RangeConfig,
        RayDirsConfig,
        ScaleAdaptorConfig,
    )
    from mapanything_tpu.models.mapanything import MapAnything, MapAnythingConfig

    directory = Path(directory).absolute()
    with open(directory / "config.json") as f:
        meta = json.load(f)
    raw = meta["config"]

    def _num(x):
        return float("inf") if x == "inf" else (-float("inf") if x == "-inf" else float(x))

    def build_dense(d):
        return DenseAdaptorConfig(
            components=tuple(d["components"]),
            with_confidence=d["with_confidence"],
            with_mask=d["with_mask"],
            ray_dirs=RayDirsConfig(**{k: (_num(v) if k in ("vmin", "vmax", "z_dir_min") else v) for k, v in d["ray_dirs"].items()}),
            depth=RangeConfig(d["depth"]["mode"], _num(d["depth"]["vmin"]), _num(d["depth"]["vmax"])),
            pointmap=RangeConfig(d["pointmap"]["mode"], _num(d["pointmap"]["vmin"]), _num(d["pointmap"]["vmax"])),
            cam_translation=RangeConfig(d["cam_translation"]["mode"], _num(d["cam_translation"]["vmin"]), _num(d["cam_translation"]["vmax"])),
            quaternions=QuatsConfig(**{k: (_num(v) if k in ("vmin", "vmax") else v) for k, v in d["quaternions"].items()}),
            confidence=ConfidenceConfig(d["confidence"]["confidence_type"], _num(d["confidence"]["vmin"]), _num(d["confidence"]["vmax"])),
        )

    cfg = MapAnythingConfig(
        **{
            k: (tuple(v) if isinstance(v, list) else v)
            for k, v in raw.items()
            if k not in ("dense_adaptor", "pose_adaptor", "scale_adaptor")
        },
        dense_adaptor=build_dense(raw["dense_adaptor"]),
        pose_adaptor=PoseAdaptorConfig(
            cam_translation=RangeConfig(
                raw["pose_adaptor"]["cam_translation"]["mode"],
                _num(raw["pose_adaptor"]["cam_translation"]["vmin"]),
                _num(raw["pose_adaptor"]["cam_translation"]["vmax"]),
            ),
            quaternions=QuatsConfig(**{k: (_num(v) if k in ("vmin", "vmax") else v) for k, v in raw["pose_adaptor"]["quaternions"].items()}),
        ),
        scale_adaptor=ScaleAdaptorConfig(
            raw["scale_adaptor"]["mode"],
            _num(raw["scale_adaptor"]["vmin"]),
            _num(raw["scale_adaptor"]["vmax"]),
        ),
    )
    model = MapAnything(cfg)

    ckptr = ocp.StandardCheckpointer()
    params = ckptr.restore(directory / "params", params_template)
    return model, params
