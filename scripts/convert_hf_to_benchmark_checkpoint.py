#!/usr/bin/env python
"""Convert a reference (torch) MapAnything checkpoint to this framework.

Parity: ``scripts/convert_hf_to_benchmark_checkpoint.py`` of the reference
(HF-hub format <-> benchmark format). Here the conversion target is this
framework's parameter tree, saved in the local hub layout
(``utils/hub.save_pretrained``) usable by every benchmark/inference script.

Accepts either a raw ``.pth``/``.bin`` torch state dict (optionally nested
under a "model" key, optionally "module."-prefixed) or a HF snapshot
directory containing ``model.safetensors``/``pytorch_model.bin``.

Usage:
    python scripts/convert_hf_to_benchmark_checkpoint.py \
        --input /path/to/model.safetensors --out ckpts/mapanything_tpu \
        [--encoder-size large] [--verify]
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def load_state(path: Path) -> dict:
    if path.is_dir():
        for name in ("model.safetensors", "pytorch_model.bin", "model.pth"):
            if (path / name).exists():
                path = path / name
                break
        else:
            raise FileNotFoundError(f"no checkpoint file found in {path}")
    if path.suffix == ".safetensors":
        from safetensors.numpy import load_file

        return dict(load_file(str(path)))
    from mapanything_tpu.utils.torch_convert import load_torch_state_dict

    return load_torch_state_dict(str(path))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help=".pth/.safetensors or HF dir")
    ap.add_argument("--out", required=True, help="output hub directory")
    ap.add_argument("--encoder-size", default="large")
    ap.add_argument(
        "--verify",
        action="store_true",
        help="init the model and check every converted shape matches",
    )
    args = ap.parse_args()

    from mapanything_tpu.utils.torch_convert import convert_mapanything

    state = load_state(Path(args.input))
    state = {
        k: np.asarray(v)
        for k, v in (state.get("model", state) if isinstance(state, dict) else state).items()
    }
    params = convert_mapanything(state)
    n = sum(x.size for x in _leaves(params))
    print(f"converted {n/1e6:.1f}M parameters")

    from mapanything_tpu.models.mapanything import MapAnything, MapAnythingConfig
    from mapanything_tpu.utils.hub import save_pretrained

    cfg = MapAnythingConfig(encoder_size=args.encoder_size)
    model = MapAnything(cfg)

    if args.verify:
        import jax

        from mapanything_tpu.utils.torch_convert import verify_tree_shapes

        views = _tiny_views()
        target = jax.jit(model.init)(jax.random.PRNGKey(0), views)["params"]
        mismatches = verify_tree_shapes(params, target)
        if mismatches:
            raise SystemExit(
                "shape mismatches:\n" + "\n".join(mismatches[:20])
            )
        print("all converted shapes match the model tree")

    out = save_pretrained(model, {"params": params}, args.out)
    print(f"saved to {out}")


def _leaves(tree):
    for v in tree.values():
        if isinstance(v, dict):
            yield from _leaves(v)
        else:
            yield v


def _tiny_views():
    import jax.numpy as jnp

    from mapanything_tpu.models.mapanything import Views

    rng = np.random.RandomState(0)
    B, V, H, W = 1, 2, 28, 28
    dirs = rng.randn(B, V, H, W, 3).astype(np.float32)
    dirs[..., 2] = np.abs(dirs[..., 2]) + 0.5
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    quats = rng.randn(B, V, 4).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    return Views(
        img=jnp.asarray(rng.rand(B, V, H, W, 3).astype(np.float32)),
        ray_directions=jnp.asarray(dirs),
        depth_along_ray=jnp.asarray(
            rng.uniform(1, 5, (B, V, H, W, 1)).astype(np.float32)
        ),
        camera_pose_quats=jnp.asarray(quats),
        camera_pose_trans=jnp.asarray(rng.randn(B, V, 3).astype(np.float32)),
        is_metric_scale=jnp.ones((B, V), bool),
    )


if __name__ == "__main__":
    main()
