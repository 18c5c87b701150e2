#!/usr/bin/env python
"""Live inference demo: upload images in a browser -> metric 3D viewer.

The native replacement for the reference's gradio app
(scripts/gradio_app.py). Usage:

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/live_demo.py \
        [--checkpoint /path/to/orbax_or_msgpack] [--port 8008] [--small]
"""

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--port", type=int, default=8008)
    ap.add_argument("--small", action="store_true",
                    help="test-scale model (random weights)")
    args = ap.parse_args()

    import jax

    from mapanything_tpu.models.mapanything import (
        MapAnything,
        MapAnythingConfig,
        Views,
    )
    from mapanything_tpu.utils.live_server import (
        make_model_infer_fn,
        make_server,
    )

    cfg = (
        MapAnythingConfig.small()
        if args.small
        else MapAnythingConfig(compute_dtype="bfloat16")
    )
    model = MapAnything(cfg)

    if args.checkpoint:
        from mapanything_tpu.utils.hub import from_pretrained

        _, params = from_pretrained(args.checkpoint)
    else:
        import jax.numpy as jnp
        import numpy as np

        print("no --checkpoint: serving RANDOM weights (structure demo)")
        views = Views(img=jnp.zeros((1, 2, 140, 140, 3), jnp.float32))
        params = jax.jit(model.init)(jax.random.PRNGKey(0), views)

    srv = make_server(make_model_infer_fn(model, params), port=args.port)
    print(f"live demo at http://localhost:{args.port}/")
    srv.serve_forever()


if __name__ == "__main__":
    main()
