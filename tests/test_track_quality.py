"""Track-quality measurement for the tracker substitution (VERDICT r4 #5).

The reference drives BA with a learned VGGSfM tracker; this framework
ships (a) the weights-free Harris+NCC tracker, (b) the descriptor
(MASt3R-style) matcher, and (c) a native flax VGGSfM network (weights
env-gated). This test puts NUMBERS on (a) and (b) against ground-truth
correspondences on a synthetic textured scene with known depth/poses:

  - track inlier rate @2px vs the closed-form GT correspondence,
  - median reprojection error of visible observations,
  - BA convergence (final RMS px) on the tracks each method produces.

The measured table lives in docs/INFERENCE.md ("Tracker substitution
quality"); this test asserts the floors so regressions surface.
"""

import numpy as np
import pytest
import scipy.ndimage as ndi

import jax.numpy as jnp

from mapanything_tpu.ba.solver import ba_solve
from mapanything_tpu.ba.tracks import _assemble_tracks_from_uv

S, H, W = 4, 96, 128
A, Bc, Cc = 4.0, 0.08, 0.05  # plane z = A + B x + C y (world frame)


def _scene():
    """Textured tilted plane viewed by translating cameras; closed-form
    depth and pixel-to-pixel GT correspondences."""
    K = np.array(
        [[W * 0.9, 0, W / 2 - 0.5], [0, W * 0.9, H / 2 - 0.5], [0, 0, 1]],
        np.float32,
    )
    rng = np.random.RandomState(0)
    # world-plane texture, smooth enough for NCC, sampled at 24 px / unit
    tex = ndi.gaussian_filter(rng.rand(512, 512).astype(np.float32), 1.5)
    tex_scale, tex_off = 24.0, 256.0

    poses = np.zeros((S, 4, 4), np.float32)
    images, depths = [], []
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    for v in range(S):
        poses[v] = np.eye(4)
        tx, ty = v * 0.12, np.sin(v * 0.7) * 0.05
        poses[v, :3, 3] = [tx, ty, 0.0]
        du = (xx - K[0, 2]) / K[0, 0]
        dv = (yy - K[1, 2]) / K[1, 1]
        # ray (du, dv, 1)*z from cam at (tx, ty, 0); plane z = A + B x + C y
        depth = (A + Bc * tx + Cc * ty) / (1.0 - Bc * du - Cc * dv)
        x_w = du * depth + tx
        y_w = dv * depth + ty
        g = ndi.map_coordinates(
            tex,
            [y_w * tex_scale + tex_off, x_w * tex_scale + tex_off],
            order=3, mode="nearest",
        ).astype(np.float32)
        images.append(np.repeat(g[..., None], 3, -1))
        depths.append(depth.astype(np.float32))
    return np.stack(images), np.stack(depths), K, poses


def _gt_project(uv, q, s, depths, K, poses):
    """GT correspondence: pixel uv in view q -> view s (identity rots)."""
    u, v = uv[..., 0], uv[..., 1]
    ui = np.clip(np.round(v).astype(int), 0, H - 1)
    uj = np.clip(np.round(u).astype(int), 0, W - 1)
    # subpixel depth from the closed form (exact, not the grid sample)
    du = (u - K[0, 2]) / K[0, 0]
    dv = (v - K[1, 2]) / K[1, 1]
    tq = poses[q, :3, 3]
    z = (A + Bc * tq[0] + Cc * tq[1]) / (1.0 - Bc * du - Cc * dv)
    xw = du * z + tq[0]
    yw = dv * z + tq[1]
    ts = poses[s, :3, 3]
    zs = A + Bc * xw + Cc * yw  # depth of the world point in view s (R=I)
    us = (xw - ts[0]) / zs * K[0, 0] + K[0, 2]
    vs = (yw - ts[1]) / zs * K[1, 1] + K[1, 2]
    del ui, uj
    return np.stack([us, vs], -1)


def _evaluate(tracks, vis, scores, depths, K, poses, thresh_px=2.0):
    """(inlier_rate, median_err_px) of visible non-query observations."""
    Sn, N, _ = tracks.shape
    q_frame = np.argmax(scores, axis=0)
    errs = []
    for n in range(N):
        q = int(q_frame[n])
        for s in range(Sn):
            if s == q or not vis[s, n]:
                continue
            gt = _gt_project(tracks[q, n], q, s, depths, K, poses)
            errs.append(np.linalg.norm(tracks[s, n] - gt))
    errs = np.asarray(errs)
    if len(errs) == 0:
        return 0.0, np.inf, 0
    return float((errs < thresh_px).mean()), float(np.median(errs)), len(errs)


def _intensity_desc(img_a, img_b):
    """Realistic (non-oracle) local-appearance descriptors: multi-scale
    blurred intensity + gradients, L2-normalized per pixel."""

    def d(img):
        g = np.asarray(img)[..., 0]
        feats = [g]
        for sig in (1.0, 2.0, 4.0):
            b = ndi.gaussian_filter(g, sig)
            feats += [b, *np.gradient(b)]
        d = np.stack(feats, -1)
        d = d - d.mean(axis=(0, 1))
        d /= np.linalg.norm(d, axis=-1, keepdims=True) + 1e-8
        return jnp.asarray(d)

    return d(img_a), d(img_b)


@pytest.fixture(scope="module")
def scene():
    return _scene()


def _ba_rms(tracks, vis, scores, depths, K, poses):
    tr = _assemble_tracks_from_uv(
        tracks, vis, scores, jnp.asarray(depths),
        jnp.broadcast_to(jnp.asarray(K), (S, 3, 3)), jnp.asarray(poses),
    )
    state, costs = ba_solve(tr, 8, 25)
    n_obs = max(int(np.asarray(tr.valid).sum()), 1)
    return float(np.sqrt(float(costs[-1]) / n_obs))


def test_ncc_tracker_quality(scene):
    from mapanything_tpu.ba.tracker import predict_tracks

    images, depths, K, poses = scene
    tracks, vis, scores = predict_tracks(
        jnp.asarray(images), max_query_pts=128, query_frame_num=2,
        vis_thresh=0.6,
    )
    inlier, med, n = _evaluate(tracks, vis, scores, depths, K, poses)
    rms = _ba_rms(tracks, vis, scores, depths, K, poses)
    print(f"\n[NCC] inlier@2px={inlier:.3f} median={med:.2f}px "
          f"obs={n} ba_rms={rms:.2f}px")
    assert n > 100, "too few visible observations to evaluate"
    assert inlier > 0.6, (inlier, med)
    assert rms < 3.0, rms


def test_descriptor_tracker_quality(scene):
    from mapanything_tpu.ba.tracker import predict_tracks_descriptors

    images, depths, K, poses = scene
    tracks, vis, scores = predict_tracks_descriptors(
        images, _intensity_desc, query_frame_num=2, subsample=8,
        sim_thresh=0.2,
    )
    inlier, med, n = _evaluate(tracks, vis, scores, depths, K, poses)
    rms = _ba_rms(tracks, vis, scores, depths, K, poses)
    print(f"\n[DESC] inlier@2px={inlier:.3f} median={med:.2f}px "
          f"obs={n} ba_rms={rms:.2f}px")
    assert n > 100, "too few visible observations to evaluate"
    # integer-grid reciprocal matching: coarser than NCC subpixel but
    # must still land most observations within 2 px on this scene.
    # Measured (docs/INFERENCE.md table): inlier 0.55, median 0.88 px,
    # BA rms 6.1 px — the non-inlier tail carries multi-px mismatches
    # that Huber bounds but does not remove.
    assert inlier > 0.4, (inlier, med)
    assert rms < 8.0, rms
