"""Rematerialization policies must not change gradients.

The remat policies (models/blocks.py resolve_remat_policy) only decide
what is SAVED vs recomputed across the backward — gradients must be
identical (fp32, same program structure) to the no-remat backward. This
pins the named-checkpoint tags ("qkv_out"/"attn_out"/"mlp_in"/"mlp_pre"/
"mlp_hidden"): a tag placed on the wrong tensor (e.g. post-activation
where the gelu backward needs the pre-activation) would silently change
what the replay recomputes and show up here as a gradient mismatch.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mapanything_tpu.models.mapanything import MapAnything, MapAnythingConfig
from mapanything_tpu.train.losses import LossBatch, LossConfig, factored_geometry_scale_loss
from mapanything_tpu.train.step import views_from_loss_batch


def _setup():
    rng = np.random.RandomState(0)
    B, V, H, W = 1, 2, 56, 56
    dirs = rng.randn(B, V, H, W, 3).astype(np.float32)
    dirs[..., 2] = np.abs(dirs[..., 2]) + 0.5
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    quats = rng.randn(B, V, 4).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    batch = LossBatch(
        pts3d=jnp.asarray(rng.randn(B, V, H, W, 3).astype(np.float32)),
        pts3d_cam=jnp.asarray(rng.randn(B, V, H, W, 3).astype(np.float32)),
        depth_along_ray=jnp.asarray(
            rng.uniform(1, 5, (B, V, H, W, 1)).astype(np.float32)
        ),
        ray_directions=jnp.asarray(dirs),
        camera_pose_quats=jnp.asarray(quats),
        camera_pose_trans=jnp.asarray(rng.randn(B, V, 3).astype(np.float32)),
        valid_mask=jnp.ones((B, V, H, W), bool),
        non_ambiguous_mask=jnp.ones((B, V, H, W), bool),
        valid_non_ambiguous_mask=jnp.ones((B, V, H, W), bool),
        is_metric_scale=jnp.ones((B,), bool),
        is_synthetic=jnp.zeros((B,), bool),
    )
    img = jnp.asarray(rng.rand(B, V, H, W, 3).astype(np.float32))
    views = views_from_loss_batch(batch, img)
    return batch, views


def _grads(cfg, batch, views, params=None):
    model = MapAnything(cfg)
    if params is None:
        params = jax.jit(model.init)(jax.random.PRNGKey(0), views)["params"]

    def loss_fn(p):
        preds = model.apply({"params": p}, views)
        loss, _ = factored_geometry_scale_loss(batch, preds, LossConfig())
        return loss

    return params, jax.jit(jax.grad(loss_fn))(params)


@pytest.mark.parametrize(
    "policy",
    [None, "save_attn", "save_attn_mlp", "save_attn_mlp_pre",
     "save_qkv_attn_mlp"]
)
def test_remat_policy_grads_match_no_remat(policy):
    batch, views = _setup()
    base_cfg = MapAnythingConfig.small(compute_dtype="float32")
    params, want = _grads(base_cfg, batch, views)
    _, got = _grads(
        base_cfg.with_updates(remat=True, remat_policy=policy),
        batch,
        views,
        params=params,
    )
    flat_w = jax.tree_util.tree_leaves_with_path(want)
    flat_g = jax.tree.leaves(got)
    assert len(flat_w) == len(flat_g)
    for (path, w), g in zip(flat_w, flat_g):
        np.testing.assert_allclose(
            np.asarray(g),
            np.asarray(w),
            rtol=2e-4,
            # atol sized to fp32 reassociation noise between structurally
            # different backward programs (gradient magnitudes are ~1e2)
            atol=1e-3,
            err_msg=jax.tree_util.keystr(path),
        )
