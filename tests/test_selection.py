import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation

from physimglobalpose_tpu.geometry import se3
from physimglobalpose_tpu.pipeline import selection


def mk(rot_deg, t):
    r = Rotation.from_euler("xyz", rot_deg, degrees=True).as_matrix()
    return np.asarray(
        se3.pose_from_rot_trans(jnp.asarray(r.astype(np.float32)), jnp.asarray(np.float32(t)))
    )


def test_lcp_select():
    tf = jnp.asarray(mk([10, 0, 0], [0.1, 0, 0.5]))
    assert np.allclose(np.asarray(selection.lcp_select(tf, jnp.asarray(0.5))), np.asarray(tf))
    np.testing.assert_allclose(
        np.asarray(selection.lcp_select(tf, jnp.asarray(0.0))), np.eye(4)
    )


def test_cluster_votes_prefers_consensus():
    # 5 hypotheses: 3 clustered near pose A (moderate scores), 2 scattered
    # (one with the single highest score). Cluster voting should prefer A.
    a = [mk([10, 0, 0], [0.1, 0.0, 0.5]),
         mk([12, 0, 0], [0.105, 0.0, 0.5]),
         mk([9, 1, 0], [0.1, 0.005, 0.5])]
    b = [mk([80, 40, 0], [0.3, 0.2, 0.7]),
         mk([-60, 10, 90], [0.0, -0.2, 0.4])]
    tfs = jnp.asarray(np.stack(a + b).astype(np.float32))
    scores = jnp.asarray(np.array([0.5, 0.55, 0.52, 0.6, 0.58], np.float32))
    sym = jnp.zeros(3)
    votes, keep = selection.greedy_cluster_votes(tfs, scores, sym)
    votes = np.asarray(votes)
    assert np.asarray(keep).all()
    assert votes[:3].max() > votes[3:].max()
    best = selection.cluster_select(tfs, scores, sym)
    # Winner comes from the consensus cluster.
    assert np.linalg.norm(np.asarray(best)[:3, 3] - [0.1, 0.0, 0.5]) < 0.02


def test_prune_factor():
    tfs = jnp.asarray(np.stack([mk([0, 0, 0], [0, 0, 0.5])] * 3).astype(np.float32))
    scores = jnp.asarray(np.array([1.0, 0.3, 0.9], np.float32))
    votes, keep = selection.greedy_cluster_votes(tfs, scores, jnp.zeros(3))
    keep = np.asarray(keep)
    assert keep[0] and keep[2] and not keep[1]  # 0.3 < 0.5 * 1.0 pruned


def test_symmetry_aware_clustering():
    # Two poses related by a 180-deg z-flip cluster together for a
    # z-180-symmetric object but not otherwise.
    t1 = mk([0, 0, 0], [0.1, 0, 0.5])
    t2 = mk([0, 0, 180], [0.1, 0, 0.5])
    tfs = jnp.asarray(np.stack([t1, t2]).astype(np.float32))
    scores = jnp.asarray(np.array([1.0, 1.0], np.float32))
    v_sym, _ = selection.greedy_cluster_votes(tfs, scores, jnp.array([0.0, 0.0, 180.0]))
    v_nosym, _ = selection.greedy_cluster_votes(tfs, scores, jnp.zeros(3))
    assert float(v_sym[0]) > float(v_nosym[0])
