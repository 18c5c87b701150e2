"""Global alignment of pairwise pointmap predictions (DUSt3R cloud_opt).

Parity: the ``dust3r.cloud_opt`` ``PointCloudOptimizer`` consumed by the
reference's DUSt3R-BA baseline (``mapanything/models/external/dust3r/
__init__.py:152-169``: pairwise inference over a scene graph -> MST
init -> Adam refinement of per-view poses/depth/focals and per-edge
similarity transforms). Re-designed for TPU:

- All edges are stacked into dense arrays and the whole objective is one
  jitted program; the Adam loop runs as ``lax.scan`` steps on device
  (the upstream optimizer is a Python loop of autograd steps per iter).
- Parameters: per-view cam2world (quat, trans), per-view log-focal,
  per-view log-depthmap; per-edge (quat, trans, log-scale) mapping each
  pair-prediction frame into world, exactly the upstream parametrization
  (``cloud_opt/optimizer.py``).
- Gauge fixing: view 0 pose pinned to identity, edge log-scales
  recentred to mean 0 (upstream ``norm_pw_scale``).
- Init: spanning tree over edge confidence, per-edge weighted
  rigid+scale Umeyama chaining (upstream ``init_from_pts3d`` / MST init).

The objective: for directed edge e=(i, j) with predictions X_e^i, X_e^j
(both expressed in frame i) and confidences C_e^i, C_e^j,

    L = sum_e  mean[ log(C_e^i) * || P_i D_i - s_e (R_e X_e^i + t_e) || ]
             + mean[ log(C_e^j) * || P_j D_j - s_e (R_e X_e^j + t_e) || ]

where P_v D_v is the global pointmap of view v from its depth, focal
(principal point fixed at the image centre) and pose.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mapanything_tpu.geometry.camera import pixel_grid
from mapanything_tpu.geometry.quaternion import (
    quat_multiply,
    quat_rotate,
    quat_to_rotmat,
    rotmat_to_quat,
)


@dataclasses.dataclass
class PairGraph:
    """Stacked directed pair predictions over V views.

    edges: (E, 2) int array of (i, j); pts_i/pts_j: (E, H, W, 3) pair
    pointmaps in frame i; conf_i/conf_j: (E, H, W) confidences (>= 1).
    """

    num_views: int
    edges: np.ndarray
    pts_i: jnp.ndarray
    pts_j: jnp.ndarray
    conf_i: jnp.ndarray
    conf_j: jnp.ndarray


def make_complete_pairs(num_views: int) -> np.ndarray:
    """Symmetrized complete scene graph (reference scene_graph="complete",
    dust3r.image_pairs.make_pairs with symmetrize=True)."""
    edges = [
        (i, j) for i in range(num_views) for j in range(num_views) if i != j
    ]
    return np.asarray(edges, np.int32)


def weighted_umeyama(
    src: jnp.ndarray, dst: jnp.ndarray, w: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Weighted similarity (s, R, t) with dst ~= s * R @ src + t.

    src/dst (N, 3), w (N,) >= 0.
    """
    w = w / jnp.maximum(jnp.sum(w), 1e-12)
    mu_s = jnp.sum(src * w[:, None], axis=0)
    mu_d = jnp.sum(dst * w[:, None], axis=0)
    sc = src - mu_s
    dc = dst - mu_d
    cov = (dc * w[:, None]).T @ sc
    u, s, vh = jnp.linalg.svd(cov)
    det = jnp.linalg.det(u @ vh)
    d = jnp.asarray([1.0, 1.0, 0.0]) + jnp.asarray([0.0, 0.0, 1.0]) * det
    R = (u * d[None, :]) @ vh
    var_s = jnp.sum(w * jnp.sum(sc * sc, axis=-1))
    scale = jnp.sum(s * d) / jnp.maximum(var_s, 1e-12)
    t = mu_d - scale * R @ mu_s
    return scale, R, t


def _spanning_tree(num_views: int, edges: np.ndarray, scores: np.ndarray):
    """Max-score spanning tree; returns list of (parent, child, edge_idx)
    in BFS order from the root (the view with the strongest edge)."""
    order = np.argsort(-scores)
    adj = {}
    for rank in order:
        i, j = edges[rank]
        adj.setdefault(int(i), []).append((int(j), int(rank)))
        adj.setdefault(int(j), []).append((int(i), int(rank)))
    root = int(edges[order[0]][0])
    seen = {root}
    tree = []
    frontier = [root]
    # Prim-like: repeatedly take the best edge leaving the seen set.
    while len(seen) < num_views:
        best = None
        for rank in order:
            i, j = int(edges[rank][0]), int(edges[rank][1])
            if (i in seen) != (j in seen):
                best = (i, j, int(rank)) if i in seen else (j, i, int(rank))
                break
        if best is None:  # disconnected graph; attach arbitrarily
            rest = sorted(set(range(num_views)) - seen)
            tree.append((root, rest[0], -1))
            seen.add(rest[0])
            continue
        tree.append(best)
        seen.add(best[1])
        frontier.append(best[1])
    return root, tree


@dataclasses.dataclass
class AlignedScene:
    """Optimization result (upstream scene.get_* accessors)."""

    focals: np.ndarray  # (V,)
    intrinsics: np.ndarray  # (V, 3, 3)
    cam2world: np.ndarray  # (V, 4, 4)
    depthmaps: np.ndarray  # (V, H, W)
    loss: float


def global_align(
    graph: PairGraph,
    niter: int = 300,
    lr: float = 0.01,
    schedule: str = "cosine",
    image_hw: Optional[Tuple[int, int]] = None,
) -> AlignedScene:
    """Run MST init + Adam global alignment; see module docstring."""
    V = graph.num_views
    E = graph.edges.shape[0]
    H, W = graph.pts_i.shape[1:3]
    if image_hw is None:
        image_hw = (H, W)
    edges_i = jnp.asarray(graph.edges[:, 0])
    edges_j = jnp.asarray(graph.edges[:, 1])
    pts_i = jnp.asarray(graph.pts_i, jnp.float32)
    pts_j = jnp.asarray(graph.pts_j, jnp.float32)
    # Upstream conf_trf="log": weights log(conf) >= 0 for conf >= 1.
    w_i = jnp.log(jnp.maximum(jnp.asarray(graph.conf_i, jnp.float32), 1.0))
    w_j = jnp.log(jnp.maximum(jnp.asarray(graph.conf_j, jnp.float32), 1.0))

    # ---- init ------------------------------------------------------
    # Focal per view from the view's own pair pointmaps (frame i):
    # z / sqrt(x^2+y^2) * r_pix, conf-weighted median over edges rooted
    # at the view (upstream estimate_focal_knowing_depth).
    u, v = pixel_grid(H, W)
    cx, cy = W / 2.0, H / 2.0
    r_pix = jnp.sqrt((u - cx) ** 2 + (v - cy) ** 2)

    def focal_from_pts(pts):
        xy = jnp.sqrt(pts[..., 0] ** 2 + pts[..., 1] ** 2)
        f = pts[..., 2] * r_pix / jnp.maximum(xy, 1e-9)
        return f

    edges_np = graph.edges
    pts_i_np = np.asarray(pts_i)
    conf_i_np = np.asarray(graph.conf_i)
    pts_j_np = np.asarray(pts_j)
    conf_j_np = np.asarray(graph.conf_j)

    focals0 = np.zeros(V, np.float32)
    depth0 = np.zeros((V, H, W), np.float32)
    for view in range(V):
        rooted = np.nonzero(edges_np[:, 0] == view)[0]
        if len(rooted) == 0:
            focals0[view] = 1.1 * max(H, W)
            depth0[view] = 1.0
            continue
        best = rooted[np.argmax(conf_i_np[rooted].mean(axis=(1, 2)))]
        f = np.asarray(focal_from_pts(pts_i[best]))
        mask = conf_i_np[best] > np.median(conf_i_np[best])
        fv = float(np.median(f[mask])) if mask.any() else float(np.median(f))
        # Guard degenerate pointmaps (negative/zero z): positive focal.
        if not np.isfinite(fv) or fv <= 0:
            fv = 1.1 * max(H, W)
        focals0[view] = fv
        depth0[view] = np.maximum(pts_i_np[best][..., 2], 1e-4)

    # Spanning-tree pose chaining: edge score = mean pair confidence.
    scores = (conf_i_np.mean(axis=(1, 2)) + conf_j_np.mean(axis=(1, 2))) / 2
    root, tree = _spanning_tree(V, edges_np, scores)
    c2w0 = np.tile(np.eye(4, dtype=np.float32), (V, 1, 1))
    for parent, child, eidx in tree:
        if eidx < 0:
            continue
        i, j = int(edges_np[eidx][0]), int(edges_np[eidx][1])
        # In frame i, view j's points are pts_j[eidx]; in frame j (its own
        # canonical frame) they are the self-view points of an edge rooted
        # at j (fall back to depth-derived pts).
        rooted_j = np.nonzero(edges_np[:, 0] == j)[0]
        if len(rooted_j) > 0:
            src = pts_i_np[rooted_j[0]].reshape(-1, 3)
            w = conf_i_np[rooted_j[0]].reshape(-1)
        else:
            zz = depth0[j]
            xx = (np.asarray(u) - cx) * zz / focals0[j]
            yy = (np.asarray(v) - cy) * zz / focals0[j]
            src = np.stack([xx, yy, zz], -1).reshape(-1, 3)
            w = np.ones(H * W, np.float32)
        dst = pts_j_np[eidx].reshape(-1, 3)
        w = w * conf_j_np[eidx].reshape(-1)
        s, R, t = weighted_umeyama(
            jnp.asarray(src), jnp.asarray(dst), jnp.asarray(w)
        )
        # dst = s R src + t maps frame j -> frame i; chain to world.
        T_ij = np.eye(4, dtype=np.float32)
        T_ij[:3, :3] = np.asarray(R) * float(s)
        T_ij[:3, 3] = np.asarray(t)
        if parent == i:
            c2w0[j] = c2w0[i] @ T_ij
        else:  # parent == j: invert the similarity
            Tinv = np.eye(4, dtype=np.float32)
            Rs = np.asarray(R) * float(s)
            Tinv[:3, :3] = np.linalg.inv(Rs)
            Tinv[:3, 3] = -Tinv[:3, :3] @ np.asarray(t)
            c2w0[i] = c2w0[j] @ Tinv

    # Strip scale from init rotations (keep it in depth/translation).
    quats0 = np.zeros((V, 4), np.float32)
    trans0 = np.zeros((V, 3), np.float32)
    for view in range(V):
        Rm = c2w0[view][:3, :3]
        s = np.cbrt(max(np.linalg.det(Rm), 1e-12))
        quats0[view] = np.asarray(rotmat_to_quat(jnp.asarray(Rm / s)))
        trans0[view] = c2w0[view][:3, 3]
        depth0[view] = depth0[view] * s

    # Re-express poses relative to view 0 (gauge: pose 0 = identity).
    params0 = {
        "quats": jnp.asarray(quats0),
        "trans": jnp.asarray(trans0),
        "log_focals": jnp.log(jnp.asarray(focals0)),
        "log_depth": jnp.log(jnp.maximum(jnp.asarray(depth0), 1e-6)),
        "e_quats": jnp.tile(
            jnp.asarray([0.0, 0.0, 0.0, 1.0], jnp.float32), (E, 1)
        ),
        "e_trans": jnp.zeros((E, 3), jnp.float32),
        "e_log_scale": jnp.zeros((E,), jnp.float32),
    }
    # Per-edge transforms init: edge frame == frame i => world via pose i.
    params0["e_quats"] = params0["quats"][edges_i]
    params0["e_trans"] = params0["trans"][edges_i]

    uv1 = jnp.stack([u - cx, v - cy, jnp.ones_like(u)], axis=-1)

    def global_pts(params):
        q = params["quats"] / jnp.maximum(
            jnp.linalg.norm(params["quats"], axis=-1, keepdims=True), 1e-12
        )
        depth = jnp.exp(params["log_depth"])  # (V, H, W)
        f = jnp.exp(params["log_focals"])  # (V,)
        scale_xy = jnp.stack(
            [1.0 / f, 1.0 / f, jnp.ones_like(f)], axis=-1
        )  # (V, 3)
        pts_cam = uv1[None] * scale_xy[:, None, None, :] * depth[..., None]
        return (
            quat_rotate(q[:, None, None, :], pts_cam)
            + params["trans"][:, None, None, :]
        )

    def loss_fn(params):
        pts_world = global_pts(params)  # (V, H, W, 3)
        eq = params["e_quats"] / jnp.maximum(
            jnp.linalg.norm(params["e_quats"], axis=-1, keepdims=True),
            1e-12,
        )
        es = jnp.exp(
            params["e_log_scale"] - jnp.mean(params["e_log_scale"])
        )  # norm_pw_scale gauge
        def align(pts):
            return (
                es[:, None, None, None]
                * quat_rotate(eq[:, None, None, :], pts)
                + params["e_trans"][:, None, None, :]
            )

        # sqrt(x^2 + eps): norm with a finite gradient at zero residual.
        def safe_norm(x):
            return jnp.sqrt(jnp.sum(x * x, axis=-1) + 1e-12)

        d_i = safe_norm(pts_world[edges_i] - align(pts_i))
        d_j = safe_norm(pts_world[edges_j] - align(pts_j))
        return jnp.mean(w_i * d_i) + jnp.mean(w_j * d_j)

    if schedule == "cosine":
        sched = optax.cosine_decay_schedule(lr, niter)
    else:
        sched = optax.linear_schedule(lr, lr / 10.0, niter)
    opt = optax.adam(sched, b1=0.9, b2=0.9)

    # Pin view 0 (gauge); everything else optimizes.
    def freeze_view0(grads):
        grads = dict(grads)
        grads["quats"] = grads["quats"].at[0].set(0.0)
        grads["trans"] = grads["trans"].at[0].set(0.0)
        return grads

    @jax.jit
    def run(params):
        state = opt.init(params)

        def step(carry, _):
            params, state = carry
            loss, grads = jax.value_and_grad(loss_fn)(params)
            grads = freeze_view0(grads)
            updates, state = opt.update(grads, state)
            params = optax.apply_updates(params, updates)
            return (params, state), loss

        (params, _), losses = jax.lax.scan(
            step, (params, state), None, length=niter
        )
        return params, losses

    params, losses = run(params0)
    params = jax.device_get(params)

    f = np.exp(params["log_focals"])
    K = np.tile(np.eye(3, dtype=np.float32), (V, 1, 1))
    K[:, 0, 0] = f
    K[:, 1, 1] = f
    K[:, 0, 2] = image_hw[1] / 2.0
    K[:, 1, 2] = image_hw[0] / 2.0
    q = params["quats"] / np.linalg.norm(
        params["quats"], axis=-1, keepdims=True
    )
    c2w = np.tile(np.eye(4, dtype=np.float32), (V, 1, 1))
    c2w[:, :3, :3] = np.asarray(quat_to_rotmat(jnp.asarray(q)))
    c2w[:, :3, 3] = params["trans"]
    return AlignedScene(
        focals=np.asarray(f),
        intrinsics=K,
        cam2world=c2w,
        depthmaps=np.exp(np.asarray(params["log_depth"])),
        loss=float(np.asarray(losses)[-1]),
    )


__all__ = [
    "PairGraph",
    "AlignedScene",
    "make_complete_pairs",
    "weighted_umeyama",
    "global_align",
]
