import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation

from physimglobalpose_tpu.geometry import metrics, se3


def pose(rot=None, t=(0, 0, 0)):
    r = np.eye(3) if rot is None else rot
    return np.asarray(se3.pose_from_rot_trans(jnp.asarray(r), jnp.asarray(np.float32(t))))


def test_pose_error_identity():
    p = pose()
    rot_err, trans_err = metrics.pose_error(
        jnp.asarray(p), jnp.asarray(p), jnp.array([0.0, 0.0, 0.0])
    )
    assert float(rot_err) < 1e-4
    assert float(trans_err) < 1e-7


def test_pose_error_translation():
    p1 = pose()
    p2 = pose(t=(0.03, 0.04, 0.0))
    _, trans_err = metrics.pose_error(jnp.asarray(p1), jnp.asarray(p2), jnp.zeros(3))
    np.testing.assert_allclose(float(trans_err), 0.05, atol=1e-6)


def test_pose_error_symmetry_folding():
    # 180-degree rotation about z is "no error" for a [0,0,180]-symmetric object.
    rot = Rotation.from_euler("z", 180, degrees=True).as_matrix()
    p1, p2 = pose(), pose(rot)
    err_nosym, _ = metrics.pose_error(jnp.asarray(p1), jnp.asarray(p2), jnp.zeros(3))
    err_sym, _ = metrics.pose_error(
        jnp.asarray(p1), jnp.asarray(p2), jnp.array([0.0, 0.0, 180.0])
    )
    assert float(err_nosym) > 30.0
    assert float(err_sym) < 1e-3


def test_pose_error_full_symmetry():
    rot = Rotation.from_euler("xyz", [77, 13, -40], degrees=True).as_matrix()
    err, _ = metrics.pose_error(
        jnp.asarray(pose()), jnp.asarray(pose(rot)), jnp.array([360.0, 360.0, 360.0])
    )
    assert float(err) == 0.0


def test_add_adds(rng):
    model = jnp.asarray(rng.normal(size=(300, 3)).astype(np.float32))
    rot = Rotation.from_euler("z", 5, degrees=True).as_matrix()
    p1, p2 = pose(), pose(rot, t=(0.01, 0, 0))
    add = float(metrics.add_error(jnp.asarray(p1), jnp.asarray(p2), model))
    adds = float(metrics.adds_error(jnp.asarray(p1), jnp.asarray(p2), model))
    assert 0 < adds <= add + 1e-6
    # ADD-S oracle: exact min-distance computation.
    a = np.asarray(se3.transform_points(jnp.asarray(p1), model))
    b = np.asarray(se3.transform_points(jnp.asarray(p2), model))
    d = np.linalg.norm(b[:, None, :] - a[None, :, :], axis=-1)
    want = d.min(axis=1).mean()
    np.testing.assert_allclose(adds, want, rtol=1e-4)


def test_adds_identical_poses_is_zero(rng):
    model = jnp.asarray(rng.normal(size=(128, 3)).astype(np.float32))
    p = jnp.asarray(pose())
    # The |a|^2+|b|^2-2ab matmul distance cancels to ~1e-6 in f32; after sqrt
    # that's ~1e-3 worst-case per point.
    assert float(metrics.adds_error(p, p, model)) < 1e-3


def test_emd_zero_for_same_pose(rng):
    model = jnp.asarray(rng.uniform(-0.05, 0.05, size=(200, 3)).astype(np.float32))
    p = jnp.asarray(pose(t=(0.0, 0.0, 0.5)))
    lo = jnp.array([-0.2, -0.2, 0.2])
    hi = jnp.array([0.2, 0.2, 0.8])
    err = float(metrics.emd_error_approx(p, p, model, lo, hi, bins=8, sinkhorn_iters=20))
    moved = jnp.asarray(pose(t=(0.1, 0.0, 0.5)))
    err_moved = float(
        metrics.emd_error_approx(p, moved, model, lo, hi, bins=8, sinkhorn_iters=20)
    )
    assert err < err_moved


def test_emd_exact_oracle_translation():
    """Exact EMD on a hand-checkable case: a pure-x translation of an
    axis-aligned blob moves every point k bins in x, so EMD == k exactly
    (every unit of mass travels an L2 bin-distance of k)."""
    model = jnp.asarray(
        np.stack(np.meshgrid(*[np.linspace(-0.04, 0.04, 5)] * 3, indexing="ij"),
                 -1).reshape(-1, 3).astype(np.float32)
    )
    lo = jnp.array([-0.2, -0.2, -0.2])
    hi = jnp.array([0.2, 0.2, 0.2])
    p = jnp.asarray(pose())
    bins = 8  # bin width 0.05
    moved = jnp.asarray(pose(t=(0.10, 0.0, 0.0)))  # exactly 2 bins in x
    got = metrics.emd_error_exact(p, moved, model, lo, hi, bins=bins)
    np.testing.assert_allclose(got, 2.0, atol=1e-6)
    same = metrics.emd_error_exact(p, p, model, lo, hi, bins=bins)
    assert same == 0.0


def test_emd_sinkhorn_error_bounded_by_exact(rng):
    """Bound the production Sinkhorn approximation against the exact LP.

    eps=0.5 entropic smoothing biases the distance by O(eps log n); measured
    on random rigid perturbations the bias stays under 0.75 bins absolute
    (documented bound; exact values are 0.5-4 bins here)."""
    model = jnp.asarray(rng.uniform(-0.06, 0.06, size=(300, 3)).astype(np.float32))
    lo = jnp.array([-0.25, -0.25, -0.25])
    hi = jnp.array([0.25, 0.25, 0.25])
    p = jnp.asarray(pose())
    worst = 0.0
    for i, t in enumerate([(0.03, 0.0, 0.0), (0.0, -0.05, 0.02), (0.08, 0.04, 0.0)]):
        moved = jnp.asarray(pose(t=t))
        exact = metrics.emd_error_exact(p, moved, model, lo, hi, bins=8)
        approx = float(
            metrics.emd_error_approx(p, moved, model, lo, hi, bins=8,
                                     sinkhorn_iters=50)
        )
        assert exact > 0.0
        worst = max(worst, abs(approx - exact))
    assert worst < 0.75, f"Sinkhorn bias {worst:.3f} bins exceeds documented bound"
