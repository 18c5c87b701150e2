"""Pseudo-depth generation for WAI scenes: monocular (MoGe) + MVS.

Parity: the reference generates pseudo ground-truth depth for datasets
without sensor depth with two offline stages —
``data_processing/wai_processing/scripts/run_moge.py`` (:46-140, MoGe
monocular depth stored as a ``pred_depth/moge`` modality) and
``run_mvsanywhere.py`` (:198-281, multi-view-stereo depth stored as
``pred_depth/mvsanywhere``).

TPU-native design: both stages run OUR models/kernels on device instead
of external torch checkpoints —

  - :func:`run_moge_on_scene` batches frames through the native flax MoGe
    (``models/external/moge.py``) under one jit;
  - :func:`plane_sweep_depth` is a classical plane-sweep MVS as a single
    jitted program: for every inverse-depth hypothesis, neighbour views
    are homography-warped into the reference camera and scored with a
    box-filtered ZNCC; the winner-takes-all depth gets a photometric
    confidence and a 3-point parabolic sub-plane refinement. All shapes
    are static (fixed hypothesis count / neighbour count), the warps are
    bilinear gathers and the filters are XLA reduce-windows, so the sweep
    runs MXU/VPU-friendly without any data-dependent control flow.

Both writers register the WAI ``pred_depth`` modality exactly like the
reference so the datasets can train on pseudo-GT transparently.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# Monocular pseudo-depth (MoGe)
# ---------------------------------------------------------------------------


def run_moge_on_scene(
    scene_root,
    params=None,
    cfg=None,
    batch_size: int = 4,
    method_name: str = "moge",
    rng_seed: int = 0,
) -> List[Path]:
    """MoGe z-depth for every frame of a WAI scene (reference run_moge.py).

    Without ``params`` the model runs at random init (useful for pipeline
    tests; real runs pass converted weights from
    ``utils/torch_convert.convert_moge``). Depth is stored as
    ``pred_depth/<method>/<frame>.exr`` with invalid (masked) pixels at 0.
    """
    import jax
    import jax.numpy as jnp

    from mapanything_tpu.data import wai as wai_io
    from mapanything_tpu.models.external.moge import MoGeConfig, MoGeWrapper

    scene_root = Path(scene_root)
    meta = wai_io.load_scene_meta(scene_root)
    frames = meta["frames"]
    wrapper = MoGeWrapper(cfg or MoGeConfig.small())

    imgs = []
    for fr in frames:
        rel = fr.get("image", fr.get("file_path"))
        imgs.append(wai_io.load_image(scene_root / rel))
    stack = np.stack(imgs)  # (V, H, W, 3)
    V, H, W, _ = stack.shape

    if params is None:
        params = wrapper.init(
            jax.random.PRNGKey(rng_seed), jnp.asarray(stack[:1])
        )

    apply = jax.jit(wrapper.apply)
    depths = np.zeros((V, H, W), np.float32)
    pad = (-V) % batch_size
    padded = np.concatenate([stack, stack[:1].repeat(pad, 0)]) if pad else stack
    for s in range(0, V + pad, batch_size):
        view = apply(params, jnp.asarray(padded[s : s + batch_size]))[0]
        d = np.asarray(view["depth_z"][..., 0], np.float32)
        m = np.asarray(view["non_ambiguous_mask"], bool)
        d = np.where(m & (d > 0), d, 0.0)
        depths[s : min(s + batch_size, V)] = d[: max(0, min(batch_size, V - s))]

    return _write_pred_depth(scene_root, meta, frames, depths, method_name)


# ---------------------------------------------------------------------------
# Multi-view-stereo pseudo-depth (plane sweep)
# ---------------------------------------------------------------------------


def _gray(img):
    import jax.numpy as jnp

    return (
        0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]
    ).astype(jnp.float32)


def _box_filter(x, r: int):
    """Mean filter with window (2r+1)^2 over the trailing two dims."""
    import jax
    import jax.numpy as jnp

    win = 2 * r + 1
    ones = [1] * (x.ndim - 2)
    s = jax.lax.reduce_window(
        x,
        0.0,
        jax.lax.add,
        tuple(ones) + (win, win),
        tuple(ones) + (1, 1),
        "SAME",
    )
    cnt = jax.lax.reduce_window(
        jnp.ones_like(x),
        0.0,
        jax.lax.add,
        tuple(ones) + (win, win),
        tuple(ones) + (1, 1),
        "SAME",
    )
    return s / cnt


def _bilinear_sample(img, u, v):
    """img (H, W) sampled at float coords; out-of-bounds -> 0 + invalid."""
    import jax.numpy as jnp

    H, W = img.shape
    valid = (u >= 0) & (u <= W - 1) & (v >= 0) & (v <= H - 1)
    u = jnp.clip(u, 0.0, W - 1.001)
    v = jnp.clip(v, 0.0, H - 1.001)
    u0 = jnp.floor(u).astype(jnp.int32)
    v0 = jnp.floor(v).astype(jnp.int32)
    du = u - u0
    dv = v - v0
    flat = img.reshape(-1)

    def at(vy, ux):
        return flat[vy * W + ux]

    val = (
        at(v0, u0) * (1 - du) * (1 - dv)
        + at(v0, u0 + 1) * du * (1 - dv)
        + at(v0 + 1, u0) * (1 - du) * dv
        + at(v0 + 1, u0 + 1) * du * dv
    )
    return jnp.where(valid, val, 0.0), valid


def plane_sweep_depth(
    ref_img,
    nbr_imgs,
    K_ref,
    K_nbr,
    ref2nbr,
    dmin,
    dmax,
    num_planes: int = 64,
    window_radius: int = 2,
    chunk: int = 8,
):
    """Winner-takes-all plane-sweep MVS depth for one reference view.

    Args:
        ref_img: (H, W, 3) float in [0, 1].
        nbr_imgs: (N, H, W, 3) neighbour images.
        K_ref: (3, 3); K_nbr: (N, 3, 3).
        ref2nbr: (N, 4, 4) transforms from ref camera to each neighbour.
        dmin/dmax: scalar depth range; hypotheses are uniform in INVERSE
            depth between them (standard plane-sweep spacing).
        num_planes: hypothesis count (static).
        window_radius: ZNCC window radius (static).
        chunk: hypotheses per ``lax.map`` step (static; bounds memory at
            chunk * N * H * W floats).

    Returns:
        depth (H, W) float32, confidence (H, W) in [0, 1] (mean ZNCC of
        the winning plane across valid neighbours, clipped to [0, 1]).

    The traced body is jitted per (num_planes, window_radius, chunk)
    signature via :func:`_plane_sweep_jit`.
    """
    import jax
    import jax.numpy as jnp

    H, W = ref_img.shape[:2]
    N = nbr_imgs.shape[0]
    g_ref = _gray(ref_img)
    g_nbr = _gray(nbr_imgs)

    mu_r = _box_filter(g_ref, window_radius)
    var_r = _box_filter(g_ref * g_ref, window_radius) - mu_r * mu_r

    ys, xs = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32),
        jnp.arange(W, dtype=jnp.float32),
        indexing="ij",
    )
    Kinv = jnp.linalg.inv(K_ref)
    rays = jnp.einsum(
        "ij,hwj->hwi", Kinv, jnp.stack([xs, ys, jnp.ones_like(xs)], -1)
    )  # (H, W, 3) direction with z=1

    inv_d = jnp.linspace(1.0 / dmax, 1.0 / dmin, num_planes)
    R = ref2nbr[:, :3, :3]
    t = ref2nbr[:, :3, 3]

    def score_plane(inv_depth):
        """Mean ZNCC across neighbours for one fronto-parallel plane."""
        pts = rays / inv_depth  # (H, W, 3) in ref camera
        cam = jnp.einsum("nij,hwj->nhwi", R, pts) + t[:, None, None]
        z = cam[..., 2]
        uvw = jnp.einsum("nij,nhwj->nhwi", K_nbr, cam)
        safe_z = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
        u = uvw[..., 0] / safe_z
        v = uvw[..., 1] / safe_z

        samp, valid = jax.vmap(_bilinear_sample)(g_nbr, u, v)
        valid = valid & (z > 0)
        sampf = jnp.where(valid, samp, 0.0)

        mu_s = _box_filter(sampf, window_radius)
        var_s = _box_filter(sampf * sampf, window_radius) - mu_s * mu_s
        cov = _box_filter(sampf * g_ref[None], window_radius) - mu_s * mu_r[None]
        zncc = cov * jax.lax.rsqrt(
            jnp.maximum(var_s * var_r[None], 1e-8)
        )  # (N, H, W)
        w = valid.astype(jnp.float32)
        return jnp.sum(zncc * w, 0) / jnp.maximum(jnp.sum(w, 0), 1.0)

    def chunk_body(inv_chunk):
        return jax.vmap(score_plane)(inv_chunk)

    scores = jax.lax.map(
        chunk_body, inv_d.reshape(num_planes // chunk, chunk)
    ).reshape(num_planes, H, W)

    best = jnp.argmax(scores, axis=0)  # (H, W)
    best_score = jnp.max(scores, axis=0)

    # 3-point parabolic refinement on the inverse-depth grid.
    ip = jnp.clip(best, 1, num_planes - 2)
    oh = jnp.arange(H)[:, None]
    ow = jnp.arange(W)[None, :]
    s0 = scores[ip - 1, oh, ow]
    s1 = scores[ip, oh, ow]
    s2 = scores[ip + 1, oh, ow]
    denom = s0 - 2 * s1 + s2
    delta = jnp.where(jnp.abs(denom) > 1e-8, 0.5 * (s0 - s2) / denom, 0.0)
    delta = jnp.clip(delta, -0.5, 0.5)
    step = (inv_d[1] - inv_d[0]) if num_planes > 1 else 0.0
    inv_best = inv_d[ip] + delta * step
    depth = 1.0 / jnp.maximum(inv_best, 1e-8)
    conf = jnp.clip(best_score, 0.0, 1.0)
    return depth.astype(jnp.float32), conf.astype(jnp.float32)


_PLANE_SWEEP_JIT = None


def _plane_sweep_jit():
    """Jitted :func:`plane_sweep_depth` (lazy so importing this module
    never touches a jax backend; jax caches per static signature)."""
    global _PLANE_SWEEP_JIT
    if _PLANE_SWEEP_JIT is None:
        import jax

        _PLANE_SWEEP_JIT = jax.jit(
            plane_sweep_depth,
            static_argnames=("num_planes", "window_radius", "chunk"),
        )
    return _PLANE_SWEEP_JIT


def run_mvs_on_scene(
    scene_root,
    num_neighbors: int = 4,
    num_planes: int = 64,
    window_radius: int = 2,
    depth_range: Optional[Tuple[float, float]] = None,
    min_confidence: float = 0.2,
    method_name: str = "mvs",
    covis_version: str = "v0",
) -> List[Path]:
    """Plane-sweep MVS pseudo-depth for every frame of a WAI scene.

    Neighbour selection follows the covisibility matrix when present
    (top-k most covisible views, the reference MVS pipeline's frame
    selection), otherwise nearest frame indices. Depth range defaults to
    the baseline-scaled [0.1 * b, 50 * b] with b = median camera-center
    spacing, so the sweep adapts to scene scale.
    """
    import jax.numpy as jnp

    from mapanything_tpu.data import wai as wai_io

    scene_root = Path(scene_root)
    meta = wai_io.load_scene_meta(scene_root)
    frames = meta["frames"]
    V = len(frames)

    imgs, Ks, poses = [], [], []
    for fr in frames:
        data = wai_io.load_frame(
            scene_root, fr["frame_name"], ["image", "intrinsics", "pose"], meta=meta
        )
        imgs.append(data["image"])
        Ks.append(data["intrinsics"])
        poses.append(data["pose"])
    imgs = np.stack(imgs)
    Ks = np.stack(Ks)
    c2w = np.stack(poses)
    w2c = np.linalg.inv(c2w)

    try:
        covis = np.asarray(wai_io.load_covisibility(scene_root, covis_version))
    except FileNotFoundError:
        covis = None

    centers = c2w[:, :3, 3]
    if depth_range is None:
        d = np.linalg.norm(centers[:, None] - centers[None], axis=-1)
        b = float(np.median(d[d > 0])) if V > 1 and (d > 0).any() else 1.0
        depth_range = (0.1 * b, 50.0 * b)

    n_nbr = min(num_neighbors, max(V - 1, 1))
    depths = np.zeros(imgs.shape[:3], np.float32)
    for i in range(V):
        if covis is not None:
            order = np.argsort(-covis[i])
        else:
            order = np.argsort(np.abs(np.arange(V) - i))
        nbrs = [j for j in order if j != i][:n_nbr]
        if not nbrs:
            continue
        ref2nbr = w2c[nbrs] @ c2w[i]
        depth, conf = _plane_sweep_jit()(
            jnp.asarray(imgs[i]),
            jnp.asarray(imgs[nbrs]),
            jnp.asarray(Ks[i]),
            jnp.asarray(Ks[nbrs]),
            jnp.asarray(ref2nbr.astype(np.float32)),
            float(depth_range[0]),
            float(depth_range[1]),
            num_planes=num_planes,
            window_radius=window_radius,
        )
        d = np.array(depth)
        d[np.asarray(conf) < min_confidence] = 0.0
        depths[i] = d

    return _write_pred_depth(scene_root, meta, frames, depths, method_name)


# ---------------------------------------------------------------------------
# Shared writer
# ---------------------------------------------------------------------------


def _write_pred_depth(
    scene_root: Path,
    meta: Dict,
    frames: Sequence[Dict],
    depths: np.ndarray,
    method_name: str,
) -> List[Path]:
    """Store ``pred_depth/<method>/<frame>.exr`` + register the modality
    (reference run_moge.py:120-140 / run_mvsanywhere.py:257-281 layout)."""
    from mapanything_tpu.utils.exr import write_depth_exr

    out_dir = scene_root / "pred_depth" / method_name / "depth"
    out_dir.mkdir(parents=True, exist_ok=True)
    key = f"{method_name}_depth"

    paths = []
    for fr, d in zip(frames, depths):
        p = out_dir / f"{fr['frame_name']}.exr"
        write_depth_exr(p, np.asarray(d, np.float32))
        fr[key] = str(p.relative_to(scene_root))
        paths.append(p)

    fm = meta.setdefault("frame_modalities", {})
    pd = fm.setdefault("pred_depth", {})
    pd[method_name] = {"frame_key": key, "format": "depth"}
    with open(scene_root / "scene_meta.json", "w") as f:
        json.dump(meta, f, indent=2)
    return paths
