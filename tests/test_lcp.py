import jax.numpy as jnp
import numpy as np
from scipy.spatial import cKDTree
from scipy.spatial.transform import Rotation

from physimglobalpose_tpu.ops import lcp


def oracle_weighted_lcp(transform, model_pts, model_nrm, seg_pts, seg_nrm, seg_prob,
                        delta=0.005, gate_deg=30.0):
    # Re-derivation of WeightedVerify (match4pcsBase.cc:1733-1766) with scipy kd-tree.
    tree = cKDTree(seg_pts)
    tm = model_pts @ transform[:3, :3].T + transform[:3, 3]
    tn = model_nrm @ transform[:3, :3].T
    score = 0.0
    for i in range(len(tm)):
        d, j = tree.query(tm[i])
        if d <= delta:
            c = abs(np.dot(tn[i], seg_nrm[j]))
            ang = np.degrees(np.arccos(np.clip(np.dot(tn[i], seg_nrm[j]), -1, 1)))
            ang = min(ang, abs(180 - ang))
            if ang < gate_deg:
                score += seg_prob[j]
    return score / len(tm)


def make_scene(rng, n_model=200, n_seg=150):
    model = rng.uniform(-0.05, 0.05, size=(n_model, 3)).astype(np.float32)
    mn = rng.normal(size=(n_model, 3))
    mn = (mn / np.linalg.norm(mn, axis=1, keepdims=True)).astype(np.float32)
    rot = Rotation.from_euler("xyz", [10, 20, 30], degrees=True).as_matrix().astype(np.float32)
    t = np.array([0.05, -0.03, 0.6], np.float32)
    # Segment = transformed subset of the model + noise + clutter.
    idx = rng.choice(n_model, size=n_seg - 30, replace=False)
    seg = model[idx] @ rot.T + t + rng.normal(scale=0.001, size=(n_seg - 30, 3))
    clutter = rng.uniform(-0.2, 0.2, size=(30, 3)) + t
    seg_pts = np.concatenate([seg, clutter]).astype(np.float32)
    seg_nrm = np.concatenate([mn[idx] @ rot.T, rng.normal(size=(30, 3))])
    seg_nrm = (seg_nrm / np.linalg.norm(seg_nrm, axis=1, keepdims=True)).astype(np.float32)
    seg_prob = rng.uniform(0.5, 1.0, size=(n_seg,)).astype(np.float32)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = rot
    pose[:3, 3] = t
    return model, mn, seg_pts, seg_nrm, seg_prob, pose


def test_xla_matches_oracle(rng):
    model, mn, seg_pts, seg_nrm, seg_prob, pose = make_scene(rng)
    bad = np.eye(4, dtype=np.float32)
    bad[:3, 3] = [1.0, 1.0, 1.0]
    transforms = np.stack([pose, bad])
    mask = np.ones(len(seg_pts), bool)
    got = np.asarray(
        lcp.lcp_scores_xla(
            jnp.asarray(transforms), jnp.asarray(model), jnp.asarray(mn),
            jnp.asarray(seg_pts), jnp.asarray(seg_nrm), jnp.asarray(seg_prob),
            jnp.asarray(mask), delta=0.005, weighted=True,
        )
    )
    want0 = oracle_weighted_lcp(pose, model, mn, seg_pts, seg_nrm, seg_prob)
    np.testing.assert_allclose(got[0], want0, atol=5e-3)
    assert got[1] < 0.01
    assert got[0] > 0.3  # true pose explains most of the model subset


def test_unweighted_counts(rng):
    model, mn, seg_pts, seg_nrm, seg_prob, pose = make_scene(rng)
    mask = np.ones(len(seg_pts), bool)
    got = float(
        lcp.lcp_scores_xla(
            jnp.asarray(pose)[None], jnp.asarray(model), jnp.asarray(mn),
            jnp.asarray(seg_pts), jnp.asarray(seg_nrm), jnp.asarray(seg_prob),
            jnp.asarray(mask), weighted=False,
        )[0]
    )
    tree = cKDTree(seg_pts)
    tm = model @ pose[:3, :3].T + pose[:3, 3]
    d, _ = tree.query(tm)
    want = (d <= 0.005).mean()
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_segment_mask_respected(rng):
    model, mn, seg_pts, seg_nrm, seg_prob, pose = make_scene(rng)
    mask = np.zeros(len(seg_pts), bool)  # all invalid -> zero score
    got = float(
        lcp.lcp_scores_xla(
            jnp.asarray(pose)[None], jnp.asarray(model), jnp.asarray(mn),
            jnp.asarray(seg_pts), jnp.asarray(seg_nrm), jnp.asarray(seg_prob),
            jnp.asarray(mask), weighted=True,
        )[0]
    )
    assert got == 0.0


def test_pallas_interpret_matches_xla(rng):
    # Run the pallas kernel in interpreter mode on CPU and compare to XLA.
    import functools
    from unittest import mock

    model, mn, seg_pts, seg_nrm, seg_prob, pose = make_scene(rng, n_model=128, n_seg=96)
    mask = np.ones(len(seg_pts), bool)
    args = (
        jnp.asarray(np.stack([pose, np.eye(4, dtype=np.float32)])),
        jnp.asarray(model), jnp.asarray(mn), jnp.asarray(seg_pts),
        jnp.asarray(seg_nrm), jnp.asarray(seg_prob), jnp.asarray(mask),
    )
    want = np.asarray(lcp.lcp_scores_xla(*args))
    import jax
    from jax.experimental import pallas as pl

    orig_call = pl.pallas_call
    with mock.patch.object(pl, "pallas_call", functools.partial(orig_call, interpret=True)):
        got = np.asarray(
            lcp.lcp_scores_pallas.__wrapped__(*args, ns_tile=64)
        )
    # atol tolerance also covers the documented tie-break difference: on
    # exact NN-distance ties the kernel takes max prob / max |normal-dot|
    # across tied points while the XLA path uses the single argmin point
    # (ADVICE r1); random float coordinates make exact ties measure-zero.
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_score_refine_pipeline(rng):
    from physimglobalpose_tpu.ops import scoring

    model, mn, seg_pts, seg_nrm, seg_prob, pose = make_scene(rng, n_model=256, n_seg=160)
    mask = np.ones(len(seg_pts), bool)
    # 16 hypotheses: the true pose, small perturbations, and garbage.
    tfs = np.tile(np.eye(4, dtype=np.float32), (16, 1, 1))
    tfs[0] = pose
    for i in range(1, 8):
        tfs[i] = pose
        tfs[i, :3, 3] += np.random.default_rng(i).normal(scale=0.004, size=3)
    for i in range(8, 16):
        tfs[i, :3, 3] = [1.0, 1.0, 1.0]
    out = scoring.score_refine_pipeline(
        jnp.asarray(tfs), jnp.asarray(model), jnp.asarray(mn),
        jnp.asarray(model), jnp.asarray(mn),
        jnp.asarray(seg_pts), jnp.asarray(seg_nrm), jnp.asarray(seg_prob),
        jnp.asarray(mask),
        top_k=8, coarse_subsample=2, icp_iters=5, use_pallas=False,
    )
    assert out.top_transforms.shape == (8, 4, 4)
    scores = np.asarray(out.top_scores)
    assert (np.diff(scores) <= 1e-6).all()  # sorted descending
    assert scores[0] > 0.3  # best survivor explains the scene
    # ICP refinement should bring perturbed poses close to the true one.
    best = np.asarray(out.top_transforms[0])
    assert np.linalg.norm(best[:3, 3] - pose[:3, 3]) < 0.01


def test_segside_tiled_interpret_matches_xla(rng):
    # Model larger than the lane budget: the per-hypothesis formulation with
    # model tiles streaming via the grid (the fine-stage shape). At
    # ns=768(+pad 256) the budget is 1024 lanes, so nv=2048 runs two tiles
    # and the hypothesis-batched fast path (which needs 8 whole model tiles
    # in the budget) cannot trigger.
    import functools
    from unittest import mock

    model, mn, seg_pts, seg_nrm, seg_prob, pose = make_scene(
        rng, n_model=2048, n_seg=768
    )
    mask = np.ones(len(seg_pts), bool)
    mask[-16:] = False
    args = (
        jnp.asarray(np.stack([pose, np.eye(4, dtype=np.float32)])),
        jnp.asarray(model), jnp.asarray(mn), jnp.asarray(seg_pts),
        jnp.asarray(seg_nrm), jnp.asarray(seg_prob), jnp.asarray(mask),
    )
    want = np.asarray(lcp.lcp_scores_xla(*args))
    want_u = np.asarray(lcp.lcp_scores_xla(*args, weighted=False))
    from jax.experimental import pallas as pl

    orig_call = pl.pallas_call
    with mock.patch.object(pl, "pallas_call", functools.partial(orig_call, interpret=True)):
        got = np.asarray(lcp.lcp_scores_pallas_segside.__wrapped__(*args))
        got_u = np.asarray(
            lcp.lcp_scores_pallas_segside.__wrapped__(*args, weighted=False)
        )
    # Unweighted depends only on the (exact) min distance - must match.
    np.testing.assert_allclose(got_u, want_u, atol=1e-5)
    # Weighted: the kernel's documented tie-break (max prob across
    # exactly-tied NN, here also across tiles) can pick a different equal-
    # distance neighbor than XLA's argmin for isolated points; allow a
    # couple of points' worth of probability (2/nv).
    np.testing.assert_allclose(got, want, atol=2.0 / 2048)


def test_segside_interpret_matches_xla(rng):
    # The segment-stationary production kernel in interpreter mode. At this
    # shape (nv=128 padded, ns=96) 8 model copies fit the lane budget, so
    # this exercises the hypothesis-batched wide-matmul path
    # (_lcp_kernel_segside_hb) - the production coarse-ranking dispatch.
    import functools
    from unittest import mock

    model, mn, seg_pts, seg_nrm, seg_prob, pose = make_scene(rng, n_model=128, n_seg=96)
    mask = np.ones(len(seg_pts), bool)
    mask[-8:] = False
    args = (
        jnp.asarray(np.stack([pose, np.eye(4, dtype=np.float32)])),
        jnp.asarray(model), jnp.asarray(mn), jnp.asarray(seg_pts),
        jnp.asarray(seg_nrm), jnp.asarray(seg_prob), jnp.asarray(mask),
    )
    want = np.asarray(lcp.lcp_scores_xla(*args))
    want_u = np.asarray(lcp.lcp_scores_xla(*args, weighted=False))
    from jax.experimental import pallas as pl

    orig_call = pl.pallas_call
    with mock.patch.object(pl, "pallas_call", functools.partial(orig_call, interpret=True)):
        got = np.asarray(lcp.lcp_scores_pallas_segside.__wrapped__(*args))
        got_u = np.asarray(
            lcp.lcp_scores_pallas_segside.__wrapped__(*args, weighted=False)
        )
    np.testing.assert_allclose(got, want, atol=1e-4)
    np.testing.assert_allclose(got_u, want_u, atol=1e-4)


def test_segside_hb_tiled_interpret_matches_xla(rng):
    # The generalized model-tiled hypothesis-batched path (hb_lane_pack=True
    # at a shape where the single-tile HB cannot trigger): model wider than
    # the lane budget streams as shared tiles through the second grid
    # dimension, partial scores accumulating per hypothesis.
    import functools
    from unittest import mock

    model, mn, seg_pts, seg_nrm, seg_prob, pose = make_scene(
        rng, n_model=2048, n_seg=768
    )
    mask = np.ones(len(seg_pts), bool)
    mask[-16:] = False
    tfs = np.tile(np.eye(4, dtype=np.float32), (10, 1, 1))
    tfs[0] = pose
    for i in range(1, 10):
        tfs[i] = pose
        tfs[i, :3, 3] += np.random.default_rng(i).normal(scale=0.01, size=3)
    args = (
        jnp.asarray(tfs),
        jnp.asarray(model), jnp.asarray(mn), jnp.asarray(seg_pts),
        jnp.asarray(seg_nrm), jnp.asarray(seg_prob), jnp.asarray(mask),
    )
    want = np.asarray(lcp.lcp_scores_xla(*args))
    want_u = np.asarray(lcp.lcp_scores_xla(*args, weighted=False))
    from jax.experimental import pallas as pl

    orig_call = pl.pallas_call
    with mock.patch.object(pl, "pallas_call", functools.partial(orig_call, interpret=True)):
        got = np.asarray(
            lcp.lcp_scores_pallas_segside.__wrapped__(*args, hb_lane_pack=True)
        )
        got_u = np.asarray(
            lcp.lcp_scores_pallas_segside.__wrapped__(
                *args, weighted=False, hb_lane_pack=True
            )
        )
        ph = np.asarray(
            lcp.lcp_scores_pallas_segside.__wrapped__(*args, hb_lane_pack=False)
        )
        ph_u = np.asarray(
            lcp.lcp_scores_pallas_segside.__wrapped__(
                *args, weighted=False, hb_lane_pack=False
            )
        )
    # The HB lane packing is a pure re-layout of the per-hypothesis kernel:
    # the unweighted count (integer sums in f32) is bit-identical; the
    # weighted sum reassociates across the different tile groupings, so low
    # bits may differ.
    np.testing.assert_array_equal(got_u, ph_u)
    np.testing.assert_allclose(got, ph, atol=1e-6)
    # vs XLA: the segside kernels center coordinates at the segment centroid,
    # which re-rounds boundary points (a point exactly at delta can flip by
    # ~1e-7) - allow a couple of points; weighted additionally has the
    # documented max-prob tie-break (see test_segside_tiled_*).
    np.testing.assert_allclose(got_u, want_u, atol=2.0 / 2048)
    np.testing.assert_allclose(got, want, atol=2.0 / 2048)
