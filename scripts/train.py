#!/usr/bin/env python
"""Config-driven training CLI.

Parity: ``scripts/train.py`` of the reference (hydra-driven train(cfg)):
composes configs/train.yaml, builds the dataset DSL, model, and Trainer,
and runs the epoch loop with auto-resume.

Usage:
    python scripts/train.py [--config configs/train.yaml]
        [--override train_params.lr=5e-5 ...] [--dataset-expr "<DSL>"]

The dataset expression is the reference's dataset DSL, e.g.
    "1000 @ ETH3DWAI(ROOT=..., dataset_metadata_dir=..., num_views=4,
                     resolution=(518, 392), covisibility_thres=0.25)"
evaluated against the WAI dataset registry (data/datasets).
"""

from __future__ import annotations

import argparse
from pathlib import Path


def build_dataset(expr: str, default_kwargs=None):
    """Evaluate a dataset DSL expression (reference datasets/__init__.py:35)."""
    from mapanything_tpu.data.datasets.wai_datasets import ALL_WAI_DATASETS

    namespace = {f"{name}WAI": cls for name, cls in ALL_WAI_DATASETS.items()}
    namespace.update({name: cls for name, cls in ALL_WAI_DATASETS.items()})
    return eval(expr, {"__builtins__": {}}, namespace)  # noqa: S307 — config DSL


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/train.yaml")
    ap.add_argument("--override", action="append", default=[])
    ap.add_argument("--dataset-expr", default=None, help="dataset DSL string")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mapanything_tpu.data.loader import MultiViewDataLoader
    from mapanything_tpu.models.mapanything import (
        GeometricInputConfig,
        MapAnything,
        MapAnythingConfig,
    )
    from mapanything_tpu.train.loop import (
        Trainer,
        TrainLoopConfig,
        loss_batch_from_numpy,
    )
    from mapanything_tpu.train.losses import LossConfig
    from mapanything_tpu.train.step import views_from_loss_batch
    from mapanything_tpu.utils.config import load_config

    cfg = load_config(args.config, overrides=args.override)
    mcfg = cfg["model"]
    tp = cfg["train_params"]

    model_cfg = MapAnythingConfig(
        encoder_size=mcfg["encoder"]["size"],
        patch_size=mcfg["encoder"]["patch_size"],
        info_sharing_depth=mcfg["info_sharing"]["depth"],
        info_sharing_dim=mcfg["info_sharing"]["dim"],
        info_sharing_num_heads=mcfg["info_sharing"]["num_heads"],
        info_sharing_indices=tuple(mcfg["info_sharing"]["indices"]),
        use_entropy_scaling=mcfg["info_sharing"].get("use_entropy_scaling", False),
        dpt_feature_dim=mcfg["pred_head"]["dpt_feature_dim"],
        dpt_hooks=tuple(mcfg["pred_head"]["dpt_hooks"]),
        dpt_layer_dims=tuple(mcfg["pred_head"]["dpt_layer_dims"]),
        scene_rep_type=mcfg["pred_head"]["scene_rep_type"],
        compute_dtype=mcfg.get("compute_dtype", "bfloat16"),
        # Activation rematerialization (the reference recipe trains 518 px
        # with grad checkpointing on the encoder; bash .sh stage scripts).
        # Override from the CLI: --override model.remat=true
        # model.remat_policy=save_qkv_attn_mlp (see resolve_remat_policy).
        remat=bool(mcfg.get("remat", tp.get("grad_checkpointing", False))),
        remat_policy=mcfg.get("remat_policy", tp.get("remat_policy")),
        encoder_remat=mcfg.get("encoder_remat"),
        trunk_remat=mcfg.get("trunk_remat"),
        encoder_remat_policy=mcfg.get("encoder_remat_policy"),
        trunk_remat_policy=mcfg.get("trunk_remat_policy"),
    )
    model = MapAnything(model_cfg)
    geo_cfg = GeometricInputConfig(**{
        k: v for k, v in mcfg["task"].items()
        if k in GeometricInputConfig.__dataclass_fields__
    })
    loss_cfg = LossConfig(**{
        k: v for k, v in cfg["loss"].items()
        if k in LossConfig.__dataclass_fields__
    })

    dataset_expr = args.dataset_expr or cfg.get("dataset", {}).get("train_dataset")
    assert dataset_expr and dataset_expr != "???", (
        "no dataset: pass --dataset-expr or compose a configs/dataset group"
    )
    dataset = build_dataset(dataset_expr)
    dist = cfg.get("distributed", {})
    mesh_cfg = dist.get("mesh", {}) or {}
    mesh = None
    view_par = int(mesh_cfg.get("view_parallelism", 1) or 1)
    data_par = mesh_cfg.get("data_parallelism", -1)
    if view_par > 1 or (isinstance(data_par, int) and data_par > 1):
        from mapanything_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(jax.devices(), view_parallelism=view_par)
        print(f"training on mesh {dict(mesh.shape)}")
    images_per_batch = cfg.get(
        "images_per_batch", dist.get("max_num_of_imgs_per_chip", 8)
    )
    loader = MultiViewDataLoader(
        dataset,
        images_per_batch=images_per_batch,
        num_workers=cfg.get("num_workers",
                            cfg.get("dataset", {}).get("num_workers", 8)),
        world_size=jax.process_count(),
        rank=jax.process_index(),
    )

    seed = cfg.get("seed", tp.get("seed", 0))
    loader.set_epoch(0)
    first = next(iter(loader))
    batch = loss_batch_from_numpy(first)
    views = views_from_loss_batch(batch, jnp.asarray(first["img"]))
    params = jax.jit(model.init)(jax.random.PRNGKey(seed), views)["params"]

    loop_cfg = TrainLoopConfig(
        output_dir=cfg.get("output_dir", "outputs/train"),
        epochs=tp["epochs"],
        warmup_epochs=tp["warmup_epochs"],
        lr=tp["lr"],
        min_lr=tp["min_lr"],
        weight_decay=tp["weight_decay"],
        grad_clip_norm=tp["grad_clip_norm"],
        save_freq=tp["save_freq"],
        keep_freq=tp["keep_freq"],
        print_freq=tp["print_freq"],
        seed=seed,
        submodule_configs=tp.get("submodule_configs", {}) or {},
        accum_iter=int(dist.get("accum_iter", 1)),
    )
    trainer = Trainer(
        model, loader, loop_cfg, loss_cfg=loss_cfg, geo_cfg=geo_cfg,
        init_params=params, mesh=mesh,
    )
    if mesh is not None:
        with mesh:
            trainer.train()
    else:
        trainer.train()


if __name__ == "__main__":
    main()
