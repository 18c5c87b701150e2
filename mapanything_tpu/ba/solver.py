"""Bundle adjustment: Schur-complement Gauss-Newton with CG, pure JAX.

Replaces the reference's C++ BA — ``pycolmap.bundle_adjustment`` (Ceres)
called at ``scripts/demo_colmap.py:466-485`` — with a TPU-native solver:

  - residuals: pinhole reprojection error per (track, camera) observation,
    Huber-robustified, static (N, M) layout with validity masks;
  - per-observation Jacobians via vmapped ``jax.jacfwd`` (2x6 camera,
    2x3 point blocks);
  - Levenberg-damped normal equations reduced by the Schur complement:
    point blocks Hpp are 3x3 and inverted in closed form; the reduced
    camera system S = Hcc - Hcp Hpp^-1 Hpc is solved matrix-free by CG
    where every S @ v product is two segment-sums over observations —
    under pjit these lower to psum-style collectives when observations
    are sharded across chips (the "BA reductions over ICI" design of
    BASELINE.json);
  - camera rotations updated on the manifold (axis-angle left-increments).

Everything jits; one ``ba_solve`` call runs the full Gauss-Newton loop via
``lax.scan`` (static iteration counts).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from mapanything_tpu.ba.tracks import Tracks


def _exp_so3(w: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle (3,) -> rotation matrix via Rodrigues, differentiable at 0.

    Branch-free Taylor-guarded form: R = I + A K + B K^2 with K = skew(w),
    A = sin(t)/t, B = (1 - cos t)/t^2, switching to their series near t = 0.
    (A hard ``where(theta < eps, I, R)`` would zero the Jacobian at the
    linearization point w = 0 — the BA system differentiates exactly there.)
    """
    theta2 = jnp.sum(w * w)
    theta = jnp.sqrt(theta2 + 1e-24)
    small = theta2 < 1e-8
    A = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / jnp.maximum(theta2, 1e-24))
    K = jnp.array(
        [[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]], w.dtype
    )
    return jnp.eye(3, dtype=w.dtype) + A * K + B * (K @ K)


def _project(K, R0, rot_delta, trans, point):
    """Reproject one world point into one camera with pose increment.

    Camera model: x_cam = exp(rot_delta) @ R0 @ X + t  (w2c), u = K x / z.
    """
    R = _exp_so3(rot_delta) @ R0
    x = R @ point + trans
    z = jnp.maximum(x[2], 1e-6)
    u = K[0, 0] * x[0] / z + K[0, 2]
    v = K[1, 1] * x[1] / z + K[1, 2]
    return jnp.stack([u, v])


def _residual_one(K, R0, rot_delta, trans, point, uv_obs):
    return _project(K, R0, rot_delta, trans, point) - uv_obs


def _huber_weight(r2: jnp.ndarray, delta: float) -> jnp.ndarray:
    """IRLS weight sqrt(w) for the Huber loss on squared residual norm."""
    r = jnp.sqrt(jnp.maximum(r2, 1e-12))
    return jnp.where(r <= delta, 1.0, jnp.sqrt(delta / r))


class BAState(NamedTuple):
    rot: jnp.ndarray  # (M, 3, 3) current w2c rotations
    trans: jnp.ndarray  # (M, 3)
    points: jnp.ndarray  # (N, 3)


def _build_system(tracks: Tracks, state: BAState, huber_delta: float):
    """Per-observation residuals + Jacobian blocks, Huber-weighted.

    Returns r (N, M, 2), Jc (N, M, 2, 6), Jp (N, M, 2, 3), valid weights.
    """
    N, M = tracks.valid.shape

    def per_obs(K, R0, t, p, uv):
        zero = jnp.zeros(3)

        def f(rot_delta, trans, point):
            return _residual_one(K, R0, rot_delta, trans, point, uv)

        r = f(zero, t, p)
        Jrot = jax.jacfwd(f, argnums=0)(zero, t, p)  # (2, 3)
        Jt = jax.jacfwd(f, argnums=1)(zero, t, p)  # (2, 3)
        Jp = jax.jacfwd(f, argnums=2)(zero, t, p)  # (2, 3)
        return r, jnp.concatenate([Jrot, Jt], axis=1), Jp

    per_cam = jax.vmap(per_obs, in_axes=(0, 0, 0, None, 0))  # over M
    per_all = jax.vmap(per_cam, in_axes=(None, None, None, 0, 0))  # over N

    r, Jc, Jp = per_all(
        tracks.intrinsics, state.rot, state.trans, state.points,
        tracks.observations_uv,
    )
    w = _huber_weight(jnp.sum(r * r, axis=-1), huber_delta)
    w = w * tracks.valid
    sw = w[..., None]
    return r * sw, Jc * sw[..., None], Jp * sw[..., None]


def _schur_solve(r, Jc, Jp, lm_lambda: float, cg_iters: int,
                 fix_first_cam: bool = True, axis_name=None):
    """Solve the damped normal equations by Schur reduction + CG.

    Shapes: r (N, M, 2), Jc (N, M, 2, 6), Jp (N, M, 2, 3).
    Returns (delta_cam (M, 6), delta_pts (N, 3)).

    With ``axis_name`` set (inside ``shard_map`` over the track axis — see
    :func:`ba_solve_sharded`), N is the LOCAL track count and every
    track-contracted product (Hcc, bc, the reduced RHS, and each Schur
    matvec inside CG) is completed with a ``psum`` over the mesh axis —
    the "BA reductions over ICI" design: camera-sized (M, 6) vectors ride
    the interconnect, point blocks never leave their shard.

    Gauge handling: BA has 6 (pose) + 1 (scale) gauge freedoms; without
    fixing them the reduced system is rank-deficient and CG returns huge
    steps along the null space. The first camera is frozen INSIDE the
    system via a strong diagonal prior (zeroing its delta after the solve
    would invalidate the step); multiplicative LM damping absorbs the
    scale gauge.
    """
    reduce_tracks = (
        (lambda x: jax.lax.psum(x, axis_name))
        if axis_name is not None
        else (lambda x: x)
    )
    # Blocks. Track-contracted blocks are segment-sums over the local
    # observations completed by the cross-shard reduction.
    Hpp = jnp.einsum("nmki,nmkj->nij", Jp, Jp)  # (N, 3, 3) local
    Hcc = reduce_tracks(jnp.einsum("nmki,nmkj->mij", Jc, Jc))  # (M, 6, 6)
    Hcp = jnp.einsum("nmki,nmkj->nmij", Jc, Jp)  # (N, M, 6, 3) local
    bc = -reduce_tracks(jnp.einsum("nmki,nmk->mi", Jc, r))  # (M, 6)
    bp = -jnp.einsum("nmki,nmk->ni", Jp, r)  # (N, 3) local

    eye3 = jnp.eye(3)
    eye6 = jnp.eye(6)
    # Multiplicative (Marquardt) damping handles the wildly different
    # scales of rotation/translation/point blocks.
    Hpp = Hpp + lm_lambda * jax.vmap(jnp.diag)(
        jnp.maximum(jax.vmap(jnp.diag)(Hpp), 1e-6)
    ) + 1e-8 * eye3
    Hcc = Hcc + lm_lambda * jax.vmap(jnp.diag)(
        jnp.maximum(jax.vmap(jnp.diag)(Hcc), 1e-6)
    ) + 1e-8 * eye6
    if fix_first_cam:
        gauge_prior = jnp.zeros_like(Hcc).at[0].set(1e12 * eye6)
        Hcc = Hcc + gauge_prior
        bc = bc.at[0].set(0.0)
    Hpp_inv = jnp.linalg.inv(Hpp)  # (N, 3, 3) closed form per point

    # Reduced RHS: b~ = bc - Hcp Hpp^-1 bp
    hinv_bp = jnp.einsum("nij,nj->ni", Hpp_inv, bp)  # (N, 3)
    b_red = bc - reduce_tracks(jnp.einsum("nmij,nj->mi", Hcp, hinv_bp))

    def S_matvec(v):  # v (M, 6) replicated across track shards
        hv = jnp.einsum("mij,mj->mi", Hcc, v)
        t = jnp.einsum("nmji,mj->ni", Hcp, v)  # Hpc v, (N, 3) local
        t = jnp.einsum("nij,nj->ni", Hpp_inv, t)
        hv = hv - reduce_tracks(jnp.einsum("nmij,nj->mi", Hcp, t))
        return hv

    # Jacobi-preconditioned CG on the reduced camera system.
    diag = jnp.maximum(jax.vmap(jnp.diag)(Hcc), 1e-8)  # (M, 6)

    def cg_body(carry, _):
        x, rr, p, rz = carry
        Ap = S_matvec(p)
        alpha = rz / jnp.maximum(jnp.sum(p * Ap), 1e-12)
        x = x + alpha * p
        rr = rr - alpha * Ap
        z = rr / diag
        rz_new = jnp.sum(rr * z)
        beta = rz_new / jnp.maximum(rz, 1e-12)
        p = z + beta * p
        return (x, rr, p, rz_new), None

    x0 = jnp.zeros_like(b_red)
    r0 = b_red
    z0 = r0 / diag
    (delta_cam, *_), _ = jax.lax.scan(
        cg_body, (x0, r0, z0, jnp.sum(r0 * z0)), None, length=cg_iters
    )

    # Back-substitute points: dp = Hpp^-1 (bp - Hpc dc)
    hpc_dc = jnp.einsum("nmji,mj->ni", Hcp, delta_cam)
    delta_pts = jnp.einsum("nij,nj->ni", Hpp_inv, bp - hpc_dc)
    return delta_cam, delta_pts


def _apply_update(state: BAState, delta_cam, delta_pts, fix_first_cam: bool):
    if fix_first_cam:
        delta_cam = delta_cam.at[0].set(0.0)
    rot_new = jax.vmap(lambda d, R: _exp_so3(d) @ R)(delta_cam[:, :3], state.rot)
    trans_new = state.trans + delta_cam[:, 3:]
    return BAState(rot=rot_new, trans=trans_new, points=state.points + delta_pts)


def _total_cost(tracks: Tracks, state: BAState, huber_delta: float,
                axis_name=None):
    r, _, _ = _build_system(tracks, state, huber_delta)
    cost = jnp.sum(r * r)
    return jax.lax.psum(cost, axis_name) if axis_name is not None else cost


def _gauss_newton_loop(
    tracks: Tracks,
    num_iterations: int,
    cg_iters: int,
    huber_delta: float,
    fix_first_cam: bool,
    lm_lambda: float,
    axis_name=None,
) -> Tuple[BAState, jnp.ndarray]:
    """The shared GN/LM loop; with ``axis_name`` set, ``tracks`` is the
    local track shard and all camera-system reductions cross the mesh."""
    state = BAState(
        rot=tracks.cam_from_world_rot,
        trans=tracks.cam_from_world_trans,
        points=tracks.points3d,
    )

    def gn_step(carry, _):
        state, lam = carry
        r, Jc, Jp = _build_system(tracks, state, huber_delta)
        delta_cam, delta_pts = _schur_solve(
            r, Jc, Jp, lam, cg_iters, fix_first_cam, axis_name
        )
        new_state = _apply_update(state, delta_cam, delta_pts, fix_first_cam)
        old_cost = jnp.sum(r * r)
        if axis_name is not None:
            old_cost = jax.lax.psum(old_cost, axis_name)
        new_cost = _total_cost(tracks, new_state, huber_delta, axis_name)
        improved = new_cost < old_cost
        # Levenberg lambda adaptation; reject steps that worsen the cost.
        state = jax.tree.map(
            lambda new, old: jnp.where(improved, new, old), new_state, state
        )
        lam = jnp.where(improved, lam * 0.5, lam * 4.0)
        lam = jnp.clip(lam, 1e-8, 1e4)
        return (state, lam), new_cost

    (state, _), costs = jax.lax.scan(
        gn_step, (state, jnp.asarray(lm_lambda)), None, length=num_iterations
    )
    return state, costs


@partial(jax.jit, static_argnums=(1, 2, 4))
def ba_solve(
    tracks: Tracks,
    num_iterations: int = 10,
    cg_iters: int = 20,
    huber_delta: float = 2.0,
    fix_first_cam: bool = True,
    lm_lambda: float = 1e-3,
) -> Tuple[BAState, jnp.ndarray]:
    """Run Gauss-Newton BA. Returns (refined state, per-iter cost history)."""
    return _gauss_newton_loop(
        tracks, num_iterations, cg_iters, huber_delta, fix_first_cam, lm_lambda
    )


BA_TRACK_AXIS = "ba_tracks"


def ba_solve_sharded(
    tracks: Tracks,
    mesh,
    num_iterations: int = 10,
    cg_iters: int = 20,
    huber_delta: float = 2.0,
    fix_first_cam: bool = True,
    lm_lambda: float = 1e-3,
    axis: str = None,
) -> Tuple[BAState, jnp.ndarray]:
    """Distributed BA: observations sharded over the mesh's track axis.

    The multi-chip realization of the design this module's docstring (and
    BASELINE.md's north star) promises: tracks are block-sharded across
    devices with ``shard_map``; per-track work (Jacobians, Hpp inverses,
    point back-substitution) stays device-local, and the camera-sized
    Schur products (Hcc, the reduced RHS, every CG matvec) complete with
    ``psum`` collectives — (M, 6)-sized traffic over ICI per CG step,
    independent of the number of observations. Equality with the
    single-device :func:`ba_solve` is tested on the 8-device CPU mesh in
    ``tests/test_ba.py``. Replaces the single-process C++ Ceres BA of
    ``/root/reference/scripts/demo_colmap.py:466-485``.

    Tracks whose count does not divide the axis size are padded with
    invalid observations (zero Huber weight — they contribute nothing and
    their point updates are dropped on unpad).
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    axis = axis or mesh.axis_names[0]
    k = mesh.shape[axis]
    N = tracks.valid.shape[0]
    pad = (-N) % k
    if pad:
        def pad_n(x):
            widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
            return jnp.pad(x, widths)

        tracks = tracks.replace(
            points3d=pad_n(tracks.points3d),
            observations_uv=pad_n(tracks.observations_uv),
            valid=pad_n(tracks.valid),
        )

    track_specs = Tracks(
        points3d=P(axis),
        observations_uv=P(axis),
        valid=P(axis),
        intrinsics=P(),
        cam_from_world_rot=P(),
        cam_from_world_trans=P(),
    )
    out_specs = (
        BAState(rot=P(), trans=P(), points=P(axis)),
        P(),
    )

    def solve_local(tr_local):
        return _gauss_newton_loop(
            tr_local, num_iterations, cg_iters, huber_delta,
            fix_first_cam, lm_lambda, axis_name=axis,
        )

    solve = jax.jit(
        shard_map(
            solve_local, mesh=mesh, in_specs=(track_specs,),
            out_specs=out_specs,
        )
    )
    state, costs = solve(tracks)
    if pad:
        state = state._replace(points=state.points[:N])
    return state, costs


def refined_camera_poses(state: BAState) -> jnp.ndarray:
    """BA state -> (M, 4, 4) cam2world poses."""
    rot_c2w = jnp.swapaxes(state.rot, -1, -2)
    t_c2w = -jnp.einsum("mij,mj->mi", rot_c2w, state.trans)
    top = jnp.concatenate([rot_c2w, t_c2w[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0, 0, 1]), (state.rot.shape[0], 1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)
