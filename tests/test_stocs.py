"""End-to-end StoCS tests on synthetic geometry: base sampling, congruent
extraction, and full hypothesis generation recovering a known transform."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from physimglobalpose_tpu.config import PipelineConfig, StoCSConfig, PreprocessConfig
from physimglobalpose_tpu.ops import congruent, ppf, sampling
from physimglobalpose_tpu.pipeline import hypothesis
from physimglobalpose_tpu.pipeline.segmentation import Segment3D


def box_model(rng, n=256, size=(0.12, 0.08, 0.05)):
    """Points on a box surface with exact face normals."""
    sx, sy, sz = size
    areas = np.array([sy * sz, sy * sz, sx * sz, sx * sz, sx * sy, sx * sy])
    faces = rng.choice(6, size=n, p=areas / areas.sum())
    u = rng.uniform(-0.5, 0.5, size=n)
    v = rng.uniform(-0.5, 0.5, size=n)
    pts = np.zeros((n, 3))
    nrm = np.zeros((n, 3))
    for i, f in enumerate(faces):
        ax = f // 2
        sign = 1.0 if f % 2 == 0 else -1.0
        dims = [d for d in range(3) if d != ax]
        pts[i, ax] = sign * [sx, sy, sz][ax] / 2
        pts[i, dims[0]] = u[i] * [sx, sy, sz][dims[0]]
        pts[i, dims[1]] = v[i] * [sx, sy, sz][dims[1]]
        nrm[i, ax] = sign
    return pts.astype(np.float32), nrm.astype(np.float32)


@pytest.fixture(scope="module")
def box_assets():
    rng = np.random.default_rng(7)
    mpts, mnrm = box_model(rng, n=200)
    table = ppf.build_ppf_table(mpts, mnrm)
    return mpts, mnrm, table


def make_segment(rng, mpts, mnrm, n_seg=160):
    rot = Rotation.from_euler("xyz", [15, -25, 40], degrees=True).as_matrix().astype(np.float32)
    t = np.array([0.02, -0.05, 0.65], np.float32)
    idx = rng.choice(len(mpts), size=n_seg, replace=False)
    seg_pts = mpts[idx] @ rot.T + t
    seg_nrm = mnrm[idx] @ rot.T
    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = rot
    pose[:3, 3] = t
    return seg_pts.astype(np.float32), seg_nrm.astype(np.float32), pose


def test_sample_bases_validity(box_assets, rng):
    mpts, mnrm, table = box_assets
    seg_pts, seg_nrm, _ = make_segment(rng, mpts, mnrm)
    n = len(seg_pts)
    bases = sampling.sample_bases(
        jax.random.key(0),
        jnp.asarray(seg_pts), jnp.asarray(seg_nrm),
        jnp.ones(n), jnp.ones(n, bool), table, num_bases=32,
    )
    valid = np.asarray(bases.valid)
    assert valid.mean() > 0.5  # segment matches the model, so PPFs exist
    idx = np.asarray(bases.indices)
    # All four indices distinct per valid base.
    for b in range(32):
        if valid[b]:
            assert len(set(idx[b])) == 4
    inv1 = np.asarray(bases.invariant1)[valid]
    inv2 = np.asarray(bases.invariant2)[valid]
    assert ((inv1 >= -0.01) & (inv1 <= 1.01)).all()
    assert ((inv2 >= -0.01) & (inv2 <= 1.01)).all()


def test_sample_bases_zero_prob_never_picked(box_assets, rng):
    mpts, mnrm, table = box_assets
    seg_pts, seg_nrm, _ = make_segment(rng, mpts, mnrm)
    n = len(seg_pts)
    prob = np.ones(n, np.float32)
    prob[: n // 2] = 0.0  # first half masked out
    bases = sampling.sample_bases(
        jax.random.key(1),
        jnp.asarray(seg_pts), jnp.asarray(seg_nrm),
        jnp.asarray(prob), jnp.ones(n, bool), table, num_bases=16,
    )
    idx = np.asarray(bases.indices)[np.asarray(bases.valid)]
    assert (idx >= n // 2).all()


def test_congruent_quads_found(box_assets, rng):
    mpts, mnrm, table = box_assets
    seg_pts, seg_nrm, _ = make_segment(rng, mpts, mnrm)
    n = len(seg_pts)
    bases = sampling.sample_bases(
        jax.random.key(2),
        jnp.asarray(seg_pts), jnp.asarray(seg_nrm),
        jnp.ones(n), jnp.ones(n, bool), table, num_bases=16,
    )
    quads, valid = congruent.extract_congruent_quads(
        bases, jnp.asarray(seg_pts), jnp.asarray(seg_nrm),
        jnp.asarray(mpts), table, jax.random.key(3),
        max_pairs=128, max_quads_per_base=32,
    )
    # At least some bases should find congruent model quads.
    assert int(valid.sum()) > 0
    q = np.asarray(quads)[np.asarray(valid)]
    assert ((q >= 0) & (q < len(mpts))).all()


def test_generate_hypotheses_recovers_pose(box_assets, rng):
    mpts, mnrm, table = box_assets
    seg_pts, seg_nrm, true_pose = make_segment(rng, mpts, mnrm)
    n_pad = 256
    pts = np.zeros((n_pad, 3), np.float32)
    nrm = np.zeros((n_pad, 3), np.float32)
    pts[: len(seg_pts)] = seg_pts
    nrm[: len(seg_pts)] = seg_nrm
    mask = np.zeros(n_pad, bool)
    mask[: len(seg_pts)] = True
    seg = Segment3D(
        pts=jnp.asarray(pts), nrm=jnp.asarray(nrm),
        prob=jnp.asarray(mask.astype(np.float32)), mask=jnp.asarray(mask),
    )
    cfg = PipelineConfig(
        stocs=StoCSConfig(num_bases=48, max_quads_per_base=32, max_pairs_per_ppf=128),
    )
    res = hypothesis.generate_hypotheses(
        jax.random.key(4), seg,
        jnp.asarray(mpts), jnp.ones(len(mpts), bool), table,
        jnp.asarray(mpts), jnp.asarray(mnrm),
        cfg, use_pallas=False,
    )
    assert bool(res.enough_points)
    assert float(res.best_score) > 0.2
    best = np.asarray(res.best_transform)
    # Recovered pose must map the model onto the segment: compare transformed
    # model clouds (box symmetry makes direct pose comparison ambiguous).
    a = mpts @ best[:3, :3].T + best[:3, 3]
    b = mpts @ true_pose[:3, :3].T + true_pose[:3, 3]
    from scipy.spatial import cKDTree

    d, _ = cKDTree(b).query(a)
    assert np.mean(d) < 0.008


def test_generate_hypotheses_degenerate_segment(box_assets):
    mpts, mnrm, table = box_assets
    n_pad = 256
    seg = Segment3D(
        pts=jnp.zeros((n_pad, 3)), nrm=jnp.zeros((n_pad, 3)),
        prob=jnp.zeros(n_pad), mask=jnp.zeros(n_pad, bool),
    )
    cfg = PipelineConfig(
        stocs=StoCSConfig(num_bases=16, max_quads_per_base=16, max_pairs_per_ppf=64),
    )
    res = hypothesis.generate_hypotheses(
        jax.random.key(5), seg,
        jnp.asarray(mpts), jnp.ones(len(mpts), bool), table,
        jnp.asarray(mpts), jnp.asarray(mnrm),
        cfg, use_pallas=False,
    )
    assert not bool(res.enough_points)
    assert float(res.best_score) == 0.0
    np.testing.assert_allclose(np.asarray(res.best_transform), np.eye(4))


def test_batched_objects_match_individual(box_assets, rng):
    """generate_hypotheses_batch(K objects) == per-object calls, same keys."""
    import jax

    mpts, mnrm, table = box_assets
    cfg = PipelineConfig(
        stocs=StoCSConfig(num_bases=16, max_quads_per_base=16, max_pairs_per_ppf=64),
    )
    # Two "objects" (same model twice keeps asset prep cheap; keys differ).
    seg_pts, seg_nrm, _ = make_segment(rng, mpts, mnrm)
    n_pad = 256
    pts = np.zeros((n_pad, 3), np.float32); pts[: len(seg_pts)] = seg_pts
    nrm = np.zeros((n_pad, 3), np.float32); nrm[: len(seg_nrm)] = seg_nrm
    mask = np.zeros(n_pad, bool); mask[: len(seg_pts)] = True
    seg = Segment3D(
        pts=jnp.asarray(pts), nrm=jnp.asarray(nrm),
        prob=jnp.asarray(mask.astype(np.float32)), mask=jnp.asarray(mask),
    )
    segs = jax.tree.map(lambda x: jnp.stack([x, x]), seg)
    stacked = hypothesis.stack_object_tables([table, table])
    msp = jnp.stack([jnp.asarray(mpts)] * 2)
    msm = jnp.stack([jnp.ones(len(mpts), bool)] * 2)
    mvn = jnp.stack([jnp.asarray(mnrm)] * 2)

    key = jax.random.key(9)
    batch = hypothesis.generate_hypotheses_batch(
        key, segs, msp, msm, stacked, msp, mvn, cfg, use_pallas=False,
    )
    keys = jax.random.split(key, 2)
    for i in range(2):
        single = hypothesis.generate_hypotheses(
            keys[i], seg, jnp.asarray(mpts), jnp.ones(len(mpts), bool), table,
            jnp.asarray(mpts), jnp.asarray(mnrm), cfg, use_pallas=False,
        )
        np.testing.assert_allclose(
            np.asarray(batch.scores[i]), np.asarray(single.scores), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(batch.best_transform[i]),
            np.asarray(single.best_transform), atol=1e-5,
        )


def test_base_sampling_follows_probability_weighting(box_assets, rng):
    """Draw 1 of the StoCS base points many times: high-probability points
    must be picked proportionally more often (the segmentation prior,
    match4pcsBase.cc:612-614)."""
    mpts, mnrm, table = box_assets
    seg_pts, seg_nrm, _ = make_segment(rng, mpts, mnrm, n_seg=120)
    n = len(seg_pts)
    prob = np.full(n, 0.1, np.float32)
    prob[:20] = 1.0  # 20 high-prior points
    bases = sampling.sample_bases(
        jax.random.key(11),
        jnp.asarray(seg_pts), jnp.asarray(seg_nrm),
        jnp.asarray(prob), jnp.ones(n, bool), table, num_bases=256,
    )
    # indices are TryQuadrilateral-reordered, so check all four slots: every
    # draw's weight multiplies the prior, so high-prior points dominate.
    idx = np.asarray(bases.indices)[np.asarray(bases.valid)]
    frac_high = (idx < 20).mean()
    # First-draw mass of the high block alone is 20/(20+100*0.1) = 2/3;
    # later PPF-gated draws dilute it, so expect well above uniform (1/6).
    assert frac_high > 0.4, frac_high


def test_v4pcs_mode_recovers_pose(box_assets, rng):
    # V4PCS tetrahedron mode (operMode 2, match4pcsBase.cc:978-1044 -
    # inactive in the reference): six-distance congruence on non-coplanar
    # bases must also recover the rigid transform.
    mpts, mnrm, table = box_assets
    seg_pts, seg_nrm, true_pose = make_segment(rng, mpts, mnrm)
    n_pad = 256
    pts = np.zeros((n_pad, 3), np.float32)
    nrm = np.zeros((n_pad, 3), np.float32)
    pts[: len(seg_pts)] = seg_pts
    nrm[: len(seg_pts)] = seg_nrm
    mask = np.zeros(n_pad, bool)
    mask[: len(seg_pts)] = True
    seg = Segment3D(
        pts=jnp.asarray(pts), nrm=jnp.asarray(nrm),
        prob=jnp.asarray(mask.astype(np.float32)), mask=jnp.asarray(mask),
    )
    cfg = PipelineConfig(
        stocs=StoCSConfig(num_bases=64, max_quads_per_base=32, max_pairs_per_ppf=128),
    )
    res = hypothesis.generate_hypotheses(
        jax.random.key(7), seg,
        jnp.asarray(mpts), jnp.ones(len(mpts), bool), table,
        jnp.asarray(mpts), jnp.asarray(mnrm),
        cfg, use_pallas=False, mode="v4pcs",
    )
    assert bool(res.enough_points)
    assert float(res.best_score) > 0.15
    best = np.asarray(res.best_transform)
    a = mpts @ best[:3, :3].T + best[:3, 3]
    b = mpts @ true_pose[:3, :3].T + true_pose[:3, 3]
    from scipy.spatial import cKDTree

    d, _ = cKDTree(b).query(a)
    assert np.mean(d) < 0.01
