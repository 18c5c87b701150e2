"""Numerical parity: native VGGSfM tracker vs the ACTUAL reference network.

Imports the reference's learned coarse→fine track predictor
(``mapanything/third_party/vggsfm_tracker.py:18``) via reference_shims,
random-inits it, converts the torch state dict with
``convert_vggsfm_tracker``, and checks our flax re-implementation
reproduces coarse tracks, fine tracks, and visibility end to end.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from reference_shims import install_reference_path, reference_available  # noqa: E402

from mapanything_tpu.models.external.vggsfm_tracker import (  # noqa: E402
    VGGSfMTracker,
)
from mapanything_tpu.utils.torch_convert import convert_vggsfm_tracker  # noqa: E402

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not present"
)


@pytest.fixture(scope="module")
def ref_and_ours():
    install_reference_path()
    from mapanything.third_party.vggsfm_tracker import TrackerPredictor

    torch.manual_seed(0)
    ref = TrackerPredictor()
    ref.eval()

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_vggsfm_tracker(sd)
    return ref, params


def _inputs(B=1, S=3, N=4, H=128, W=128, seed=0):
    # H/W >= 128: the coarse feature map is H/8 and the reference's 5-level
    # correlation pyramid needs >= 16 px at level 0.
    rng = np.random.RandomState(seed)
    images = rng.rand(B, S, 3, H, W).astype(np.float32)
    # query points away from borders so patch extraction is unclamped
    query = rng.uniform(18.0, min(H, W) - 19.0, (B, N, 2)).astype(np.float32)
    return images, query


def test_param_tree_structure_matches_init(ref_and_ours):
    _, params = ref_and_ours
    images, query = _inputs()
    model = VGGSfMTracker()
    init = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(images.transpose(0, 1, 3, 4, 2)),
        jnp.asarray(query),
    )["params"]
    fa = jax.tree_util.tree_flatten_with_path(init)[0]
    fb = jax.tree_util.tree_flatten_with_path(params)[0]
    assert [p for p, _ in fa] == [p for p, _ in fb]
    for (pa, va), (_, vb) in zip(fa, fb):
        assert va.shape == tuple(np.shape(vb)), pa


def test_coarse_predictor_parity(ref_and_ours):
    """Coarse stage at 2 refinement iterations.

    Random (untrained) weights make the iteration map non-contractive:
    the ~2e-4 feature-encoder tolerance is amplified ~100x per iteration
    by bilinear sampling of the random correlation surface (measured
    1.5e-5 -> 1.3e-3 px over iters 0 -> 1), so parity is asserted at 2
    iterations where the bound is still tight. Trained weights contract
    (deltas shrink), so this is a test-setup limit, not a model one.
    """
    ref, params = ref_and_ours
    images, query = _inputs()

    with torch.no_grad():
        _, coarse_t, vis_t, _ = ref(
            torch.from_numpy(images), torch.from_numpy(query),
            coarse_iters=2, inference=True, fine_tracking=False,
        )

    model = VGGSfMTracker()
    _, coarse_j, vis_j, _ = model.apply(
        {"params": params},
        jnp.asarray(images.transpose(0, 1, 3, 4, 2)),
        jnp.asarray(query),
        coarse_iters=2,
        fine_tracking=False,
    )

    np.testing.assert_allclose(
        np.asarray(coarse_j), coarse_t.numpy(), atol=2e-2,
        err_msg="coarse tracks",
    )
    np.testing.assert_allclose(
        np.asarray(vis_j), vis_t.numpy(), atol=1e-3, err_msg="visibility"
    )


def test_fine_refine_parity(ref_and_ours):
    """Fine stage (patch extraction + ShallowEncoder + fine predictor)
    driven by IDENTICAL coarse tracks on both sides, so the chaotic
    coarse amplification (see above) cannot leak in."""
    from mapanything.third_party.track_modules.track_refine import (
        refine_track,
    )

    from mapanything_tpu.models.external.vggsfm_tracker import (
        BaseTrackerPredictor,
        ShallowEncoder,
        extract_patches,
    )

    ref, params = ref_and_ours
    images, query = _inputs(seed=1)
    B, S, _, H, W = images.shape
    N = query.shape[1]
    rng = np.random.RandomState(5)
    coarse = (
        query[:, None] + rng.randn(B, S, N, 2).astype(np.float32) * 2.0
    )
    coarse[:, 0] = query

    # 2 refinement iterations for the same non-contraction reason as the
    # coarse test: random weights amplify the fnet's ~2e-4 tolerance
    # ~100x per bilinear-resampling iteration.
    fine_iters = 2
    with torch.no_grad():
        refined_t, _ = refine_track(
            torch.from_numpy(images), ref.fine_fnet, ref.fine_predictor,
            torch.from_numpy(coarse), compute_score=False,
            fine_iters=fine_iters,
        )

    # our fine stage, mirroring VGGSfMTracker's fine path
    pradius, psize = 15, 31
    imgs_j = jnp.asarray(images.transpose(0, 1, 3, 4, 2))
    coarse_j = jnp.asarray(coarse)
    track_int = jnp.floor(coarse_j).astype(jnp.int32)
    track_frac = coarse_j - track_int
    topleft_raw = track_int - pradius
    topleft = jnp.stack(
        [jnp.clip(topleft_raw[..., 0], 0, W - psize),
         jnp.clip(topleft_raw[..., 1], 0, H - psize)], axis=-1
    )
    patches = extract_patches(
        imgs_j.reshape(B * S, H, W, 3), topleft.reshape(B * S, N, 2), psize
    )
    feat = ShallowEncoder(stride=1).apply(
        {"params": params["fine_fnet"]},
        patches.reshape(B * S * N, psize, psize, 3),
    )
    Cf = feat.shape[-1]
    feat = feat.reshape(B, S, N, psize, psize, Cf)
    feat = jnp.transpose(feat, (0, 2, 1, 3, 4, 5)).reshape(
        B * N, S, psize, psize, Cf
    )
    pq = (track_frac[:, 0] + pradius).reshape(B * N, 1, 2)
    preds, _ = BaseTrackerPredictor(
        stride=1, depth=4, corr_levels=3, corr_radius=3, latent_dim=32,
        hidden_size=256, fine=True, use_spaceatt=False,
    ).apply({"params": params["fine_predictor"]}, pq, feat, iters=fine_iters)
    fine = jnp.swapaxes(preds[-1].reshape(B, N, S, 2), 1, 2)
    refined_j = fine + topleft_raw.astype(fine.dtype)
    refined_j = refined_j.at[:, 0].set(coarse_j[:, 0])

    np.testing.assert_allclose(
        np.asarray(refined_j), refined_t.numpy(), atol=5e-2,
        err_msg="fine tracks",
    )


def test_predict_tracks_learned_route(ref_and_ours):
    """ba.tracker.predict_tracks(tracker_params=...) must route through
    the learned network and return the classical contract: (S, N, 2)
    tracks with exact query-frame observations, (S, N) vis/scores."""
    from mapanything_tpu.ba.tracker import predict_tracks

    _, params = ref_and_ours
    rng = np.random.RandomState(7)
    import scipy.ndimage as ndi

    # textured frames so the Harris seeding finds real corners
    tex = ndi.gaussian_filter(rng.rand(3, 128, 128).astype(np.float32), 1.5)
    images = np.repeat(tex[..., None], 3, -1)

    tracks, vis, scores = predict_tracks(
        jnp.asarray(images), max_query_pts=16, query_frame_num=1,
        vis_thresh=0.5, tracker_params=params,
    )
    S, N, _ = tracks.shape
    assert S == 3 and N >= 4
    assert vis.shape == (S, N) and scores.shape == (S, N)
    assert np.isfinite(tracks).all()
    # the query frame's observations score 1.0 and are visible
    q = int(np.argmax(scores.sum(1)))
    assert (scores[q] == 1.0).all() and vis[q].all()


def test_full_pipeline_runs(ref_and_ours):
    _, params = ref_and_ours
    images, query = _inputs(seed=2)
    model = VGGSfMTracker()
    fine, coarse, vis, score = jax.jit(
        lambda p, i, q: model.apply({"params": p}, i, q)
    )(params, jnp.asarray(images.transpose(0, 1, 3, 4, 2)), jnp.asarray(query))
    B, S, _, H, W = images.shape
    N = query.shape[1]
    assert fine.shape == (B, S, N, 2) and coarse.shape == (B, S, N, 2)
    assert vis.shape == (B, S, N)
    for x in (fine, coarse, vis, score):
        assert bool(jnp.all(jnp.isfinite(x)))
    # frame 0 stays pinned to the query points
    np.testing.assert_allclose(np.asarray(fine[:, 0]), query, atol=1e-4)


def test_coarse_only_route(ref_and_ours):
    ref, params = ref_and_ours
    images, query = _inputs(seed=3)
    # 2 iterations: the random-weight iteration map is non-contractive
    # (see test_coarse_predictor_parity) — 3 iterations already drift to
    # ~0.4 px.
    with torch.no_grad():
        fine_t, coarse_t, vis_t, score_t = ref(
            torch.from_numpy(images), torch.from_numpy(query),
            coarse_iters=2, inference=True, fine_tracking=False,
        )
    model = VGGSfMTracker()
    fine_j, coarse_j, vis_j, score_j = model.apply(
        {"params": params},
        jnp.asarray(images.transpose(0, 1, 3, 4, 2)),
        jnp.asarray(query),
        coarse_iters=2,
        fine_tracking=False,
    )
    np.testing.assert_allclose(
        np.asarray(coarse_j), coarse_t.numpy(), atol=2e-2
    )
    np.testing.assert_allclose(np.asarray(vis_j), vis_t.numpy(), atol=1e-3)
    np.testing.assert_array_equal(np.asarray(score_j), score_t.numpy())
