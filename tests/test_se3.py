import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from physimglobalpose_tpu.geometry import se3


def random_rotations(rng, n):
    return Rotation.random(n, random_state=np.random.RandomState(0)).as_matrix()


def test_quat_matrix_roundtrip(rng):
    rots = random_rotations(rng, 64)
    # scipy quat is [x, y, z, w]; ours is [w, x, y, z]
    q_scipy = Rotation.from_matrix(rots).as_quat()
    q = np.concatenate([q_scipy[:, 3:], q_scipy[:, :3]], axis=1)
    m = np.asarray(se3.quat_to_matrix(jnp.asarray(q)))
    np.testing.assert_allclose(m, rots, atol=1e-6)

    q_back = np.asarray(se3.matrix_to_quat(jnp.asarray(rots)))
    m_back = np.asarray(se3.quat_to_matrix(jnp.asarray(q_back)))
    np.testing.assert_allclose(m_back, rots, atol=1e-6)


def test_matrix_to_quat_degenerate_traces():
    # Rotations by pi about each axis exercise every Shepperd pivot branch.
    for axis in ["x", "y", "z"]:
        m = Rotation.from_euler(axis, 180, degrees=True).as_matrix()
        q = np.asarray(se3.matrix_to_quat(jnp.asarray(m)))
        m2 = np.asarray(se3.quat_to_matrix(jnp.asarray(q)))
        np.testing.assert_allclose(m2, m, atol=1e-6)


def test_pose_compose_invert(rng):
    rots = random_rotations(rng, 8)
    trans = rng.normal(size=(8, 3))
    pose = np.asarray(se3.pose_from_rot_trans(jnp.asarray(rots), jnp.asarray(trans)))
    inv = np.asarray(se3.invert_pose(jnp.asarray(pose)))
    ident = np.einsum("bij,bjk->bik", pose, inv)
    np.testing.assert_allclose(ident, np.broadcast_to(np.eye(4), (8, 4, 4)), atol=1e-5)


def test_transform_points_matches_numpy(rng):
    rot = random_rotations(rng, 1)[0]
    t = rng.normal(size=(3,))
    pts = rng.normal(size=(100, 3))
    pose = np.asarray(se3.pose_from_rot_trans(jnp.asarray(rot), jnp.asarray(t)))
    got = np.asarray(se3.transform_points(jnp.asarray(pose), jnp.asarray(pts)))
    want = pts @ rot.T + t
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_world_camera_roundtrip(rng):
    rots = random_rotations(rng, 4)
    cam = np.asarray(
        se3.pose_from_rot_trans(jnp.asarray(rots[0]), jnp.asarray(rng.normal(size=3)))
    )
    obj = np.asarray(
        se3.pose_from_rot_trans(jnp.asarray(rots[1]), jnp.asarray(rng.normal(size=3)))
    )
    world = se3.to_world(jnp.asarray(obj), jnp.asarray(cam))
    back = np.asarray(se3.to_camera(world, jnp.asarray(cam)))
    np.testing.assert_allclose(back, obj, atol=1e-5)


def test_euler_matches_scipy(rng):
    rots = random_rotations(rng, 32)
    got = np.asarray(se3.matrix_to_euler_xyz(jnp.asarray(rots)))
    want = Rotation.from_matrix(rots).as_euler("xyz")
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_jit_and_vmap():
    q = jnp.array([[1.0, 0, 0, 0], [0.0, 1, 0, 0]])
    t = jnp.zeros((2, 3))
    fn = jax.jit(jax.vmap(se3.pose_from_quat_trans))
    out = fn(q, t)
    assert out.shape == (2, 4, 4)
