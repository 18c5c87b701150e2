#!/usr/bin/env python
"""Build the flagship MapAnything model and load/save local weights.

Parity: the reference root-level ``load_model.py`` [FORK] (initialize the
model from a local checkpoint without network access). Loads either a hub
directory saved by this framework (``utils/hub``) or a torch checkpoint
via the weight converter, then prints a parameter summary and optionally
re-saves in the hub layout.

Usage:
    python scripts/load_model.py [--checkpoint <hub dir | .pth | .safetensors>]
        [--save <hub dir>] [--small]
"""

from __future__ import annotations

import argparse
from pathlib import Path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--save", default=None, help="re-save to this hub dir")
    ap.add_argument("--small", action="store_true")
    args = ap.parse_args()

    import jax
    import numpy as np

    from mapanything_tpu.models.mapanything import (
        MapAnything,
        MapAnythingConfig,
        Views,
    )

    cfg = MapAnythingConfig.small() if args.small else MapAnythingConfig()
    model = MapAnything(cfg)

    if args.checkpoint and Path(args.checkpoint).is_dir() and (
        Path(args.checkpoint) / "config.json"
    ).exists():
        from mapanything_tpu.utils.hub import from_pretrained

        model, params = from_pretrained(args.checkpoint)
        print(f"loaded hub checkpoint from {args.checkpoint}")
    else:
        rng = np.random.RandomState(0)
        views = Views(
            img=jax.numpy.asarray(
                rng.rand(1, 2, 28, 28, 3).astype(np.float32)
            )
        )
        params = jax.jit(model.init)(jax.random.PRNGKey(0), views)
        if args.checkpoint:
            from mapanything_tpu.utils.torch_convert import (
                convert_mapanything,
                load_torch_state_dict,
            )

            state = load_torch_state_dict(args.checkpoint)
            params = {"params": convert_mapanything(state)}
            print(f"converted torch checkpoint {args.checkpoint}")
        else:
            print("initialized with random weights (no checkpoint given)")

    n = sum(x.size for x in jax.tree.leaves(params))
    print(f"model: {type(model).__name__}, {n/1e6:.1f}M parameters")

    if args.save:
        from mapanything_tpu.utils.hub import save_pretrained

        out = save_pretrained(model, params, args.save)
        print(f"saved to {out}")


if __name__ == "__main__":
    main()
