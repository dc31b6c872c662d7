import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation

from physimglobalpose_tpu.ops import rigid_fit


def test_seg_seg_invariants_crossing():
    # Two segments crossing at their midpoints -> inv1 = inv2 = 0.5, dist 0.
    p1, p2 = jnp.array([-1.0, 0, 0]), jnp.array([1.0, 0, 0])
    q1, q2 = jnp.array([0.0, -1, 0]), jnp.array([0.0, 1, 0])
    d, i1, i2 = rigid_fit.seg_seg_invariants(p1, p2, q1, q2)
    assert float(d) < 1e-6
    np.testing.assert_allclose([float(i1), float(i2)], [0.5, 0.5], atol=1e-6)


def test_seg_seg_invariants_offset():
    p1, p2 = jnp.array([0.0, 0, 0]), jnp.array([4.0, 0, 0])
    q1, q2 = jnp.array([1.0, -1, 1]), jnp.array([1.0, 1, 1])
    d, i1, i2 = rigid_fit.seg_seg_invariants(p1, p2, q1, q2)
    np.testing.assert_allclose(float(d), 1.0, atol=1e-5)
    np.testing.assert_allclose(float(i1), 0.25, atol=1e-5)
    np.testing.assert_allclose(float(i2), 0.5, atol=1e-5)


def test_try_quadrilateral_picks_crossing_split():
    # A planar quad where (0,1) x (2,3) segments intersect.
    pts = jnp.array(
        [[-1.0, 0, 0], [1.0, 0, 0], [0.0, -1, 0.01], [0.0, 1, 0.01]]
    )
    perm, i1, i2 = rigid_fit.try_quadrilateral(pts)
    perm = np.asarray(perm)
    # The crossing split must pair {0,1} and {2,3} (either order/direction).
    assert {int(perm[0]), int(perm[1])} in [{0, 1}, {2, 3}]
    assert 0.0 <= float(i1) <= 1.0 and 0.0 <= float(i2) <= 1.0


def test_rigid_fit_recovers_transform(rng):
    rot = Rotation.from_euler("xyz", [20, -40, 65], degrees=True).as_matrix().astype(np.float32)
    t = np.array([0.1, -0.2, 0.4], np.float32)
    q = rng.uniform(-0.1, 0.1, size=(3, 3)).astype(np.float32)
    p = q @ rot.T + t
    tf, rms, ok = rigid_fit.rigid_fit_3pt(jnp.asarray(p), jnp.asarray(q))
    assert bool(ok)
    assert float(rms) < 1e-5
    tf = np.asarray(tf)
    np.testing.assert_allclose(tf[:3, :3], rot, atol=1e-4)
    np.testing.assert_allclose(tf[:3, 3], t, atol=1e-4)


def test_rigid_fit_batched(rng):
    n = 16
    rots = Rotation.random(n, random_state=np.random.RandomState(3)).as_matrix().astype(np.float32)
    ts = rng.uniform(-0.3, 0.3, size=(n, 3)).astype(np.float32)
    q = rng.uniform(-0.1, 0.1, size=(n, 3, 3)).astype(np.float32)
    p = np.einsum("bij,bnj->bni", rots, q) + ts[:, None, :]
    tf, rms, ok = rigid_fit.rigid_fit_3pt(jnp.asarray(p), jnp.asarray(q))
    assert bool(jnp.all(ok))
    np.testing.assert_allclose(np.asarray(tf)[:, :3, :3], rots, atol=1e-3)
    np.testing.assert_allclose(np.asarray(tf)[:, :3, 3], ts, atol=1e-3)


def test_rigid_fit_decentered(rng):
    # With global centroids supplied, transform maps ORIGINAL coords.
    rot = Rotation.from_euler("z", 30, degrees=True).as_matrix().astype(np.float32)
    t = np.array([0.05, 0.02, 0.0], np.float32)
    cq = np.array([1.0, 2.0, 3.0], np.float32)  # model centroid
    cp = np.array([-0.5, 0.3, 0.9], np.float32)  # scene centroid
    q_orig = rng.uniform(-0.1, 0.1, size=(3, 3)).astype(np.float32) + cq
    p_orig = q_orig @ rot.T + t
    # centered inputs as the pipeline provides them:
    q_cent = q_orig - cq
    p_cent = p_orig - cp
    tf, rms, ok = rigid_fit.rigid_fit_3pt(
        jnp.asarray(p_cent), jnp.asarray(q_cent),
        centroid_p_global=jnp.asarray(cp), centroid_q_global=jnp.asarray(cq),
    )
    assert bool(ok)
    got = np.asarray(tf)
    moved = q_orig @ got[:3, :3].T + got[:3, 3]
    np.testing.assert_allclose(moved, p_orig, atol=1e-4)


def test_rigid_fit_degenerate_collinear():
    p = jnp.array([[0.0, 0, 0], [1.0, 0, 0], [2.0, 0, 0]])
    q = jnp.array([[0.0, 0, 0], [0.0, 1, 0], [0.0, 2, 0]])
    _, _, ok = rigid_fit.rigid_fit_3pt(p, q)
    assert not bool(ok)
