"""Full training runtime: epochs, eval, checkpoints, NaN forensics.

Parity: ``mapanything/train/training.py`` (train :44, train_one_epoch
:387, test_one_epoch :584): per-step LR schedule (inside the optax chain),
loss scaled 2/n_views (inside the step), grad clip (optimizer), epoch loop
{test, save, train}, auto-resume from the latest checkpoint
(training.py:214-227), loss-explosion forensic dump (:481-510), JSON-lines
epoch logs.

TPU-native: one jitted train step per (B, V, H, W) bucket shape (compile
cache keyed by shape), data sharded over the mesh, checkpoints via orbax.
"""

from __future__ import annotations

import pickle
import time
import dataclasses
from dataclasses import dataclass, field
from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mapanything_tpu.models.mapanything import GeometricInputConfig, MapAnything
from mapanything_tpu.train.checkpointing import CheckpointManager
from mapanything_tpu.train.losses import LossBatch, LossConfig
from mapanything_tpu.train.optim import (
    OptimConfig,
    SubmoduleOptimConfig,
    build_optimizer,
)
from mapanything_tpu.train.step import TrainState, make_eval_step, make_train_step
from mapanything_tpu.utils.logging import (
    JsonlLogger,
    MetricLogger,
    all_reduce_mean,
    print_main,
)


@dataclass
class TrainLoopConfig:
    output_dir: str = "outputs/run"
    epochs: int = 10
    warmup_epochs: float = 1.0
    lr: float = 1e-4
    min_lr: float = 1e-6
    weight_decay: float = 0.05
    grad_clip_norm: float = 1.0
    save_freq: int = 1  # epochs between checkpoint-last saves
    keep_freq: int = 0  # keep every N epochs permanently
    print_freq: int = 20
    seed: int = 0
    max_loss_explosion: float = 1e4  # NaN/explosion abort threshold
    resume: bool = True
    # Per-submodule optimizer overrides, {name: {"lr_scale": f,
    # "weight_decay": f, "frozen": bool}} (configs/train_params/*.yaml,
    # reference train_tools.py:760 parameter groups).
    submodule_configs: dict = dataclasses.field(default_factory=dict)
    # Gradient accumulation: one optimizer step per accum_iter loader
    # batches (reference training.py:433,512-526). Consecutive batches
    # with matching shapes are stacked into one lax.scan accumulation
    # step; a shape change (different AR / num-views bucket) flushes the
    # partial group through a same-maker shorter-scan step.
    accum_iter: int = 1


def loss_batch_from_numpy(batch_np: Dict[str, np.ndarray]) -> LossBatch:
    """Collated numpy batch -> device LossBatch (H2D boundary)."""
    return LossBatch(
        pts3d=jnp.asarray(batch_np["pts3d"]),
        pts3d_cam=jnp.asarray(batch_np["pts3d_cam"]),
        depth_along_ray=jnp.asarray(batch_np["depth_along_ray"]),
        ray_directions=jnp.asarray(batch_np["ray_directions_cam"]),
        camera_pose_quats=jnp.asarray(batch_np["camera_pose_quats"]),
        camera_pose_trans=jnp.asarray(batch_np["camera_pose_trans"]),
        valid_mask=jnp.asarray(batch_np["valid_mask"]),
        non_ambiguous_mask=jnp.asarray(batch_np["non_ambiguous_mask"]),
        valid_non_ambiguous_mask=jnp.asarray(
            batch_np.get("valid_non_ambiguous_mask", batch_np["non_ambiguous_mask"])
        ),
        is_metric_scale=jnp.asarray(batch_np["is_metric_scale"]),
        is_synthetic=jnp.asarray(batch_np["is_synthetic"]),
    )


class Trainer:
    """Epoch-driven trainer over a MultiViewDataLoader.

    With ``mesh`` set, every batch is placed with (data, view) shardings
    and parameters/optimizer state replicated — the single-host jit path
    and the pod path are the same code (__graft_entry__.dryrun_multichip
    validates the sharded step on the virtual mesh).
    """

    def __init__(
        self,
        model: MapAnything,
        train_loader,
        cfg: TrainLoopConfig,
        test_loader=None,
        loss_cfg: LossConfig = LossConfig(),
        geo_cfg: GeometricInputConfig = GeometricInputConfig(),
        init_params=None,
        mesh=None,
    ):
        self.model = model
        self.train_loader = train_loader
        self.test_loader = test_loader
        self.cfg = cfg
        self.loss_cfg = loss_cfg
        self.geo_cfg = geo_cfg
        self.mesh = mesh

        epoch_len = max(len(train_loader), 1)
        submods = {
            name: SubmoduleOptimConfig(
                lr_scale=0.0 if sub.get("frozen") else sub.get("lr_scale", 1.0),
                weight_decay=sub.get("weight_decay"),
            )
            for name, sub in (cfg.submodule_configs or {}).items()
        }
        self.opt_cfg = OptimConfig(
            lr=cfg.lr,
            min_lr=cfg.min_lr,
            weight_decay=cfg.weight_decay,
            grad_clip_norm=cfg.grad_clip_norm,
            warmup_epochs=cfg.warmup_epochs,
            total_epochs=cfg.epochs,
            epoch_len=epoch_len,
            submodules=submods,
        )

        if init_params is None:
            raise ValueError("init_params required (use model.init on a sample batch)")
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            rep = NamedSharding(mesh, P())
            init_params = jax.tree.map(
                lambda x: jax.device_put(x, rep), init_params
            )
        self.optimizer = build_optimizer(self.opt_cfg, init_params)
        self.state = TrainState(
            params=init_params,
            opt_state=self.optimizer.init(init_params),
            step=jnp.zeros((), jnp.int32),
        )
        self.train_step = make_train_step(
            self.model, self.optimizer, loss_cfg, geo_cfg, donate=False
        )
        self._accum_steps: Dict[int, object] = {}
        self.eval_step = make_eval_step(self.model, loss_cfg)

        self.ckpt = CheckpointManager(
            str(Path(cfg.output_dir) / "checkpoints"), keep_freq=cfg.keep_freq
        )
        # checkpoint-best: saved whenever the test loss improves
        # (reference training.py:237-287 saves 'checkpoint-best.pth').
        self.ckpt_best = CheckpointManager(
            str(Path(cfg.output_dir) / "checkpoints-best"), max_to_keep=1
        )
        self.jsonl = JsonlLogger(cfg.output_dir)
        self.start_epoch = 0
        self.best_loss = float("inf")
        self.rng = jax.random.PRNGKey(cfg.seed)

        if cfg.resume and self.ckpt.latest_step() is not None:
            restored = self.ckpt.restore(self.state)
            if restored is not None:
                self.state = restored
                meta = self.ckpt.load_metadata() or {}
                self.start_epoch = int(meta.get("epoch", 0)) + 1
                best_meta = self.ckpt_best.load_metadata() or {}
                self.best_loss = float(best_meta.get("best_loss", float("inf")))
                print_main(f"Resumed from checkpoint at epoch {self.start_epoch - 1}")

    # ------------------------------------------------------------------
    def _dump_forensics(self, batch_np, loss, epoch, it):
        """Loss-explosion dump: offending batch + debug ckpt (training.py:481)."""
        out = Path(self.cfg.output_dir) / "debug"
        out.mkdir(parents=True, exist_ok=True)
        with open(out / f"bad_batch_e{epoch}_i{it}.pkl", "wb") as f:
            pickle.dump(batch_np, f)
        self.ckpt.save(int(self.state.step), self.state, {"debug": True, "epoch": epoch})
        self.ckpt.wait()
        raise FloatingPointError(
            f"loss explosion/NaN at epoch {epoch} iter {it}: {loss}; "
            f"batch + checkpoint dumped to {out}"
        )

    def _shard_batch(self, img, batch):
        """Place (B, V, ...) arrays with (data, view) sharding on the mesh."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from mapanything_tpu.parallel.mesh import DATA_AXIS, VIEW_AXIS

        bv = NamedSharding(self.mesh, P(DATA_AXIS, VIEW_AXIS))
        b_only = NamedSharding(self.mesh, P(DATA_AXIS))

        def put(x):
            if x is None:
                return None
            if hasattr(x, "ndim") and x.ndim >= 2:
                return jax.device_put(x, bv)
            if hasattr(x, "ndim") and x.ndim == 1:
                return jax.device_put(x, b_only)
            return x

        return put(img), jax.tree.map(put, batch)

    def _accum_step_for(self, n: int):
        from mapanything_tpu.train.step import make_accum_train_step

        if n not in self._accum_steps:
            self._accum_steps[n] = make_accum_train_step(
                self.model, self.optimizer, n, self.loss_cfg, self.geo_cfg,
                donate=False,
            )
        return self._accum_steps[n]

    def _shard_stacked(self, imgs, batch_stack):
        """Place (N, B, V, ...) accumulation stacks with (data, view)
        sharding on axes 1/2 (the leading axis is the scan dim)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from mapanything_tpu.parallel.mesh import DATA_AXIS, VIEW_AXIS

        nbv = NamedSharding(self.mesh, P(None, DATA_AXIS, VIEW_AXIS))
        nb = NamedSharding(self.mesh, P(None, DATA_AXIS))

        def put(x):
            if x is None:
                return None
            if hasattr(x, "ndim") and x.ndim >= 3:
                return jax.device_put(x, nbv)
            if hasattr(x, "ndim") and x.ndim == 2:
                return jax.device_put(x, nb)
            return x

        return put(imgs), jax.tree.map(put, batch_stack)

    def _run_accum_group(self, group, step_rng):
        imgs = jnp.stack([jnp.asarray(b["img"]) for b in group])
        batches = [loss_batch_from_numpy(b) for b in group]
        batch_stack = jax.tree.map(lambda *xs: jnp.stack(xs), *batches)
        if self.mesh is not None:
            imgs, batch_stack = self._shard_stacked(imgs, batch_stack)
        return self._accum_step_for(len(group))(
            self.state, imgs, batch_stack, step_rng
        )

    def train_one_epoch(self, epoch: int) -> Dict[str, float]:
        logger = MetricLogger(print_fn=print_main)
        self.train_loader.set_epoch(epoch)
        header = f"Epoch [{epoch}]"
        if self.cfg.accum_iter > 1:
            return self._train_one_epoch_accum(epoch, logger, header)
        for it, batch_np in enumerate(
            logger.log_every(self.train_loader, self.cfg.print_freq, header)
        ):
            self.rng, step_rng = jax.random.split(self.rng)
            img = jnp.asarray(batch_np["img"])
            batch = loss_batch_from_numpy(batch_np)
            if self.mesh is not None:
                img, batch = self._shard_batch(img, batch)
            self.state, metrics = self.train_step(self.state, img, batch, step_rng)
            loss = float(metrics["loss"])
            if not np.isfinite(loss) or loss > self.cfg.max_loss_explosion:
                self._dump_forensics(batch_np, loss, epoch, it)
            logger.update(
                loss=loss, grad_norm=float(metrics["grad_norm"])
            )
        stats = logger.global_avg_dict("train_")
        stats["train_loss_synced"] = all_reduce_mean(stats.get("train_loss", 0.0))
        return stats

    def _train_one_epoch_accum(self, epoch, logger, header):
        group = []
        shape = None
        it = 0

        def flush():
            """Run the pending group; every flush (full group, bucket-shape
            change, trailing partial) gets the same loss-explosion forensic
            check (reference training.py:481-510)."""
            nonlocal group, shape
            if not group:
                return None
            last_batch = group[-1]
            self.rng, step_rng = jax.random.split(self.rng)
            self.state, metrics = self._run_accum_group(group, step_rng)
            group, shape = [], None
            loss = float(metrics["loss"])
            if not np.isfinite(loss) or loss > self.cfg.max_loss_explosion:
                self._dump_forensics(last_batch, loss, epoch, it)
            logger.update(loss=loss, grad_norm=float(metrics["grad_norm"]))
            return metrics

        for it, batch_np in enumerate(
            logger.log_every(self.train_loader, self.cfg.print_freq, header)
        ):
            b_shape = batch_np["img"].shape
            if shape is not None and b_shape != shape:
                flush()
            group.append(batch_np)
            shape = b_shape
            if len(group) == self.cfg.accum_iter:
                flush()
        flush()
        stats = logger.global_avg_dict("train_")
        stats["train_loss_synced"] = all_reduce_mean(stats.get("train_loss", 0.0))
        return stats

    def test_one_epoch(self, epoch: int) -> Dict[str, float]:
        if self.test_loader is None:
            return {}
        logger = MetricLogger(print_fn=print_main)
        self.test_loader.set_epoch(epoch)
        for batch_np in logger.log_every(
            self.test_loader, self.cfg.print_freq, f"Test [{epoch}]"
        ):
            img = jnp.asarray(batch_np["img"])
            batch = loss_batch_from_numpy(batch_np)
            if self.mesh is not None:
                img, batch = self._shard_batch(img, batch)
            metrics = self.eval_step(self.state.params, img, batch)
            logger.update(loss=float(metrics["loss"]))
        return logger.global_avg_dict("test_")

    def train(self):
        for epoch in range(self.start_epoch, self.cfg.epochs):
            t0 = time.time()
            train_stats = self.train_one_epoch(epoch)
            test_stats = self.test_one_epoch(epoch)
            stats = {
                "epoch": epoch,
                **train_stats,
                **test_stats,
                "epoch_time_s": time.time() - t0,
            }
            self.jsonl.write(stats)
            if epoch % self.cfg.save_freq == 0 or epoch == self.cfg.epochs - 1:
                self.ckpt.save(epoch, self.state, {"epoch": epoch})
            test_loss = test_stats.get("test_loss")
            if test_loss is not None and test_loss < self.best_loss:
                self.best_loss = test_loss
                self.ckpt_best.save(
                    epoch, self.state,
                    {"epoch": epoch, "best_loss": test_loss},
                )
        self.ckpt.wait()
        self.ckpt_best.wait()
        return self.state
