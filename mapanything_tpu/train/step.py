"""Jitted training / eval steps with gradient accumulation and sharding.

Capability parity with the reference train loop internals
(``mapanything/train/training.py:387-583``): per-step LR schedule lives in
the optax chain (optim.py), loss scaled by 2/n_views (training.py:475-478),
grad clip inside the optimizer, NaN-safe scalar logging. DDP becomes pjit
over a (data, view) mesh — gradients all-reduce implicitly, and the
"find_unused_parameters" problem disappears because modality masking is
multiply-by-mask (every branch always executes).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from mapanything_tpu.models.mapanything import (
    GeometricInputConfig,
    MapAnything,
    ModalityMasks,
    Views,
    sample_modality_masks,
)
from mapanything_tpu.train.losses import LossBatch, LossConfig, factored_geometry_scale_loss


@flax.struct.dataclass
class TrainState:
    params: dict
    opt_state: optax.OptState
    step: jnp.ndarray  # ()


def views_from_loss_batch(batch: LossBatch, img: jnp.ndarray) -> Views:
    """Build model inputs from a GT batch (the train-time view of the data)."""
    return Views(
        img=img,
        ray_directions=batch.ray_directions,
        depth_along_ray=batch.depth_along_ray,
        camera_pose_quats=batch.camera_pose_quats,
        camera_pose_trans=batch.camera_pose_trans,
        is_metric_scale=jnp.broadcast_to(
            batch.is_metric_scale[:, None], batch.valid_mask.shape[:2]
        ),
    )


def make_train_step(
    model: MapAnything,
    optimizer: optax.GradientTransformation,
    loss_cfg: LossConfig = LossConfig(),
    geo_cfg: GeometricInputConfig = GeometricInputConfig(),
    donate: bool = True,
):
    """Build the jitted train step: (state, img, batch, rng) -> (state, metrics).

    Randomness (modality dropout, sparse-depth sampling, random view-PE
    indices) is derived from the per-step rng — the functional analogue of
    the reference's in-forward torch.rand calls (model.py:1292-1372).
    """

    def step_fn(state: TrainState, img, batch: LossBatch, rng):
        B, V = batch.valid_mask.shape[:2]
        H, W = batch.valid_mask.shape[2:]
        rng_masks, rng_pe = jax.random.split(rng)
        masks = sample_modality_masks(rng_masks, B, V, (H, W), geo_cfg)
        views = views_from_loss_batch(batch, img)

        pe_indices = None
        if (
            model.config.use_pe_for_non_reference_views
            and model.config.use_rand_idx_pe_for_non_reference_views
            and V > 1
        ):
            pe_indices = jax.random.randint(
                rng_pe, (V - 1,), 1, model.config.max_num_views_for_pe
            )

        def loss_fn(params):
            preds = model.apply(
                {"params": params},
                views,
                masks,
                deterministic=True,
                non_ref_view_pe_indices=pe_indices,
            )
            loss, details = factored_geometry_scale_loss(batch, preds, loss_cfg)
            # loss scaled by 2 / n_views (training.py:475-478)
            return loss * 2.0 / V, details

        (loss, details), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, new_opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        new_params = optax.apply_updates(state.params, updates)
        grad_norm = optax.global_norm(grads)
        metrics = dict(details, loss=loss, grad_norm=grad_norm)
        new_state = TrainState(
            params=new_params, opt_state=new_opt_state, step=state.step + 1
        )
        return new_state, metrics

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_accum_train_step(
    model: MapAnything,
    optimizer: optax.GradientTransformation,
    accum_iter: int,
    loss_cfg: LossConfig = LossConfig(),
    geo_cfg: GeometricInputConfig = GeometricInputConfig(),
    donate: bool = True,
):
    """Gradient accumulation over ``accum_iter`` micro-batches via lax.scan.

    Parity: the reference's accum_iter loop (training.py:433,512-526). The
    micro-batch axis is the leading axis of img / batch. ``donate=False``
    keeps the caller's state buffers alive (the Trainer passes the user's
    ``init_params`` by reference, so its first step must not consume them).
    """

    def step_fn(state: TrainState, img_stack, batch_stack: LossBatch, rng):
        V = batch_stack.valid_mask.shape[2]

        def micro_loss(params, micro):
            img, batch, r = micro
            B, V_, H, W = batch.valid_mask.shape
            rm, rp = jax.random.split(r)
            masks = sample_modality_masks(rm, B, V_, (H, W), geo_cfg)
            views = views_from_loss_batch(batch, img)
            preds = model.apply({"params": params}, views, masks)
            loss, _ = factored_geometry_scale_loss(batch, preds, loss_cfg)
            return loss * 2.0 / V_

        rngs = jax.random.split(rng, accum_iter)

        def scan_body(carry, micro):
            grads_acc, loss_acc = carry
            loss, grads = jax.value_and_grad(micro_loss)(state.params, micro)
            grads_acc = jax.tree.map(jnp.add, grads_acc, grads)
            return (grads_acc, loss_acc + loss), None

        zero_grads = jax.tree.map(jnp.zeros_like, state.params)
        (grads, loss_sum), _ = jax.lax.scan(
            scan_body, (zero_grads, 0.0), (img_stack, batch_stack, rngs)
        )
        grads = jax.tree.map(lambda g: g / accum_iter, grads)
        loss = loss_sum / accum_iter

        updates, new_opt_state = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params=new_params, opt_state=new_opt_state, step=state.step + 1
        )
        return new_state, dict(loss=loss, grad_norm=optax.global_norm(grads))

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_eval_step(model: MapAnything, loss_cfg: LossConfig = LossConfig()):
    """Eval step: deterministic full-modality masks off (images only)."""

    def step_fn(params, img, batch: LossBatch):
        views = views_from_loss_batch(batch, img)
        preds = model.apply({"params": params}, views)
        loss, details = factored_geometry_scale_loss(batch, preds, loss_cfg)
        V = batch.valid_mask.shape[1]
        return dict(details, loss=loss * 2.0 / V)

    return jax.jit(step_fn)
