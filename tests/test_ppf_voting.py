import jax
import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation

from physimglobalpose_tpu.ops import ppf, ppf_voting


def test_canonical_frame_properties(rng):
    p = jnp.asarray(rng.normal(size=(8, 3)).astype(np.float32))
    n = rng.normal(size=(8, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=1, keepdims=True)
    t = ppf_voting.canonical_frame(p, jnp.asarray(n))
    # T(p) = 0 and rotation maps n to +x.
    moved = jnp.einsum("bij,bj->bi", t[:, :3, :3], p) + t[:, :3, 3]
    np.testing.assert_allclose(np.asarray(moved), 0.0, atol=1e-5)
    nx = jnp.einsum("bij,bj->bi", t[:, :3, :3], jnp.asarray(n))
    np.testing.assert_allclose(np.asarray(nx), [[1, 0, 0]] * 8, atol=1e-5)


def test_canonical_frame_degenerate():
    p = jnp.zeros((2, 3))
    n = jnp.asarray([[1.0, 0, 0], [-1.0, 0, 0]])
    t = ppf_voting.canonical_frame(p, n)
    nx = jnp.einsum("bij,bj->bi", t[:, :3, :3], n)
    np.testing.assert_allclose(np.asarray(nx), [[1, 0, 0], [1, 0, 0]], atol=1e-6)


def test_voting_recovers_pose(rng):
    # Box model with normals; scene = full model under a rigid transform.
    from tests.test_stocs import box_model

    mpts, mnrm = box_model(np.random.default_rng(3), n=160)
    table = ppf.build_ppf_table(mpts, mnrm)
    rot = Rotation.from_euler("xyz", [25, -35, 55], degrees=True).as_matrix().astype(np.float32)
    t = np.array([0.05, -0.1, 0.7], np.float32)
    seg_pts = mpts @ rot.T + t
    seg_nrm = mnrm @ rot.T
    mask = np.ones(len(seg_pts), bool)

    res = ppf_voting.ppf_vote(
        jax.random.key(0),
        jnp.asarray(seg_pts), jnp.asarray(seg_nrm), jnp.asarray(mask),
        jnp.asarray(mpts), jnp.asarray(mnrm), jnp.asarray(np.ones(len(mpts), bool)),
        table, n_ref=24, max_pairs=16, top_poses=32,
    )
    assert int(res.votes[0]) > 3
    # At least one top pose must align the model with the scene.
    from scipy.spatial import cKDTree

    tree = cKDTree(seg_pts)
    best_err = np.inf
    for tf in np.asarray(res.transforms[:16]):
        moved = mpts @ tf[:3, :3].T + tf[:3, 3]
        d, _ = tree.query(moved)
        best_err = min(best_err, float(np.mean(d)))
    assert best_err < 0.01, best_err
