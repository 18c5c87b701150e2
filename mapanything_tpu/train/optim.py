"""Optimizer construction: AdamW with per-submodule LR/WD trees + schedules.

Capability parity with the reference's parameter-group machinery
(``mapanything/utils/train_tools.py:760-937``): weight decay is disabled for
biases/1-D params, submodules can override lr / weight-decay / warmup, and
the schedule is linear-warmup + half-cycle cosine decay. Built on optax
masks and ``optax.multi_transform`` label trees instead of torch param
groups.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Dict, Optional

import flax
import jax.numpy as jnp
import optax


@dataclass(frozen=True)
class SubmoduleOptimConfig:
    lr_scale: float = 1.0  # multiplier on the base schedule (0 freezes)
    weight_decay: Optional[float] = None  # None = inherit default


@dataclass(frozen=True)
class OptimConfig:
    """Production recipe (training.py:161-163; configs/train_params)."""

    lr: float = 1e-4
    min_lr: float = 1e-6
    weight_decay: float = 0.05
    betas: tuple = (0.9, 0.95)
    grad_clip_norm: float = 1.0
    warmup_epochs: float = 0.0
    total_epochs: float = 100.0
    epoch_len: int = 1000  # steps per epoch (schedule granularity)
    submodules: Dict[str, SubmoduleOptimConfig] = field(default_factory=dict)
    # dtype of Adam's first moment (None = fp32, reference parity).
    # "bfloat16" frees 0.5x params-size HBM (~650 MB on the flagship) for
    # activation-saving remat policies.
    mu_dtype: Optional[str] = None
    # dtype of Adam's second moment (None = fp32, reference parity).
    # "bfloat16" frees another 0.5x params-size; the moment update and the
    # sqrt run in fp32 (only storage is quantized), so the update-scale
    # error is bounded by bf16's 2^-9 relative round-off — far gentler
    # than 8-bit Adam variants in production use. Opt-in memory knob for
    # activation-saving remat policies at the 16 GB HBM edge.
    nu_dtype: Optional[str] = None


def warmup_cosine_schedule(cfg: OptimConfig):
    """linear_warmup_half_cycle_cosine_decay (train_tools.py:924-937).

    Continuous in fractional epochs, evaluated per step.
    """

    def schedule(step):
        epoch = step / cfg.epoch_len
        warm = cfg.lr * epoch / max(cfg.warmup_epochs, 1e-8)
        denom = max(cfg.total_epochs - cfg.warmup_epochs, 1e-8)
        cos = cfg.min_lr + (cfg.lr - cfg.min_lr) * 0.5 * (
            1.0 + jnp.cos(math.pi * (epoch - cfg.warmup_epochs) / denom)
        )
        return jnp.where(epoch < cfg.warmup_epochs, warm, cos)

    return schedule


def _path_names(path) -> list:
    return [getattr(k, "key", getattr(k, "idx", str(k))) for k in path]


def make_weight_decay_mask(params):
    """True for params that receive weight decay: ndim >= 2, not biases.

    Parity: train_tools.py:833-838 (1-D tensors and .bias get wd = 0).
    """
    flat = flax.traverse_util.flatten_dict(params)
    mask = {
        k: (v.ndim >= 2 and not k[-1].endswith("bias")) for k, v in flat.items()
    }
    return flax.traverse_util.unflatten_dict(mask)


def make_lr_scale_tree(params, submodules: Dict[str, SubmoduleOptimConfig]):
    """Per-leaf lr multiplier tree from submodule path-prefix configs."""
    flat = flax.traverse_util.flatten_dict(params)
    scales = {}
    for k, _ in flat.items():
        scale = 1.0
        joined = "/".join(str(p) for p in k)
        for prefix, sub in submodules.items():
            if joined.startswith(prefix) or (prefix in k):
                scale = sub.lr_scale
                break
        scales[k] = scale
    return flax.traverse_util.unflatten_dict(scales)


def scale_by_adam_dtypes(
    b1: float,
    b2: float,
    eps: float = 1e-8,
    mu_dtype=None,
    nu_dtype=None,
) -> optax.GradientTransformation:
    """``optax.scale_by_adam`` with configurable STORAGE dtypes for both
    moments. Matches optax exactly when both dtypes are None/fp32; with a
    sub-fp32 storage dtype the moment update, bias correction, and
    sqrt all run in fp32 — only the carried state is quantized."""
    import jax
    import jax.numpy as jnp

    mu_dt = jnp.dtype(mu_dtype) if mu_dtype else None
    nu_dt = jnp.dtype(nu_dtype) if nu_dtype else None

    def init(params):
        mu = jax.tree.map(
            lambda p: jnp.zeros_like(p, dtype=mu_dt or p.dtype), params
        )
        nu = jax.tree.map(
            lambda p: jnp.zeros_like(p, dtype=nu_dt or p.dtype), params
        )
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32), mu=mu, nu=nu
        )

    def update(updates, state, params=None):
        del params
        count = state.count + 1
        f32 = jnp.float32
        mu32 = jax.tree.map(
            lambda g, m: b1 * m.astype(f32) + (1.0 - b1) * g.astype(f32),
            updates, state.mu,
        )
        nu32 = jax.tree.map(
            lambda g, n: b2 * n.astype(f32)
            + (1.0 - b2) * jnp.square(g.astype(f32)),
            updates, state.nu,
        )
        bc1 = 1.0 - b1 ** count.astype(f32)
        bc2 = 1.0 - b2 ** count.astype(f32)
        new_updates = jax.tree.map(
            lambda g, m32, n32: (
                (m32 / bc1) / (jnp.sqrt(n32 / bc2) + eps)
            ).astype(g.dtype),
            updates, mu32, nu32,
        )
        mu = jax.tree.map(lambda m32, m: m32.astype(m.dtype), mu32, state.mu)
        nu = jax.tree.map(lambda n32, n: n32.astype(n.dtype), nu32, state.nu)
        return new_updates, optax.ScaleByAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init, update)


def build_optimizer(cfg: OptimConfig, params) -> optax.GradientTransformation:
    """AdamW + grad clip + warmup-cosine + per-submodule lr scaling."""
    schedule = warmup_cosine_schedule(cfg)
    wd_mask = make_weight_decay_mask(params)

    if cfg.nu_dtype:
        adam = scale_by_adam_dtypes(
            b1=cfg.betas[0], b2=cfg.betas[1],
            mu_dtype=cfg.mu_dtype, nu_dtype=cfg.nu_dtype,
        )
    else:
        adam = optax.scale_by_adam(
            b1=cfg.betas[0], b2=cfg.betas[1], mu_dtype=cfg.mu_dtype
        )
    chain = [
        optax.clip_by_global_norm(cfg.grad_clip_norm),
        adam,
        optax.add_decayed_weights(cfg.weight_decay, mask=wd_mask),
    ]
    if cfg.submodules:
        lr_scales = make_lr_scale_tree(params, cfg.submodules)
        chain.append(_scale_by_tree(lr_scales))
    chain.append(optax.scale_by_learning_rate(schedule))
    return optax.chain(*chain)


def _scale_by_tree(scales):
    """Multiply each gradient leaf by its static scale factor."""

    def init(params):
        return optax.EmptyState()

    def update(updates, state, params=None):
        import jax

        scaled = jax.tree.map(lambda g, s: g * s, updates, scales)
        return scaled, state

    return optax.GradientTransformation(init, update)
