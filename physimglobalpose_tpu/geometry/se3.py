"""SE(3) utilities as pure jax.numpy — fully batched and jit/vmap friendly.

Semantics match the reference's Eigen-based helpers
(reference utilities.cpp:276-420): quaternions are [w, x, y, z] (Eigen
convention, also the gt_info.yml pose format), poses are 4x4 row-major
homogeneous matrices, world<->camera changes are plain matrix products.

Everything accepts arbitrary leading batch dimensions.
"""

from __future__ import annotations

from physimglobalpose_tpu import _jaxcfg  # noqa: F401  (platform/precision setup)
import jax.numpy as jnp


def quat_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion [..., 4] (w, x, y, z) -> rotation matrix [..., 3, 3]."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r = jnp.stack(
        [
            1 - 2 * (y * y + z * z),
            2 * (x * y - w * z),
            2 * (x * z + w * y),
            2 * (x * y + w * z),
            1 - 2 * (x * x + z * z),
            2 * (y * z - w * x),
            2 * (x * z - w * y),
            2 * (y * z + w * x),
            1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    )
    return r.reshape(q.shape[:-1] + (3, 3))


def matrix_to_quat(m: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix [..., 3, 3] -> quaternion [..., 4] (w, x, y, z).

    Branch-free Shepperd's method: compute all four candidate forms and pick
    the numerically best one (largest pivot), which is safe under vmap/jit.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidate quaternions (unnormalized), one per pivot choice.
    qw = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21], axis=-1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22], axis=-1)

    pivots = jnp.stack([1.0 + tr, 1.0 + m00 - m11 - m22, 1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22], axis=-1)
    cands = jnp.stack([qw, qx, qy, qz], axis=-2)  # [..., 4 cand, 4 comp]
    best = jnp.argmax(pivots, axis=-1)
    q = jnp.take_along_axis(cands, best[..., None, None].astype(jnp.int32), axis=-2)[..., 0, :]
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    # Canonical sign: w >= 0.
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def pose_from_quat_trans(q: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """(quat [..., 4], trans [..., 3]) -> homogeneous pose [..., 4, 4]."""
    rot = quat_to_matrix(q)
    return pose_from_rot_trans(rot, t)


def pose_from_rot_trans(rot: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    batch = jnp.broadcast_shapes(rot.shape[:-2], t.shape[:-1])
    rot = jnp.broadcast_to(rot, batch + (3, 3))
    t = jnp.broadcast_to(t, batch + (3,))
    top = jnp.concatenate([rot, t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(jnp.array([0.0, 0.0, 0.0, 1.0], dtype=top.dtype), batch + (1, 4))
    return jnp.concatenate([top, bottom], axis=-2)


def invert_pose(pose: jnp.ndarray) -> jnp.ndarray:
    """Rigid inverse: [R|t]^-1 = [R^T | -R^T t]. (utilities.cpp:303-329)."""
    rot = pose[..., :3, :3]
    t = pose[..., :3, 3]
    rot_t = jnp.swapaxes(rot, -1, -2)
    t_new = -jnp.einsum("...ij,...j->...i", rot_t, t)
    return pose_from_rot_trans(rot_t, t_new)


def compose(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pose composition a @ b with broadcasting."""
    return jnp.einsum("...ij,...jk->...ik", a, b)


def transform_points(pose: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """Apply pose [..., 4, 4] to points [..., N, 3] -> [..., N, 3]."""
    rot = pose[..., :3, :3]
    t = pose[..., :3, 3]
    return jnp.einsum("...ij,...nj->...ni", rot, points) + t[..., None, :]


def rotate_vectors(pose: jnp.ndarray, vecs: jnp.ndarray) -> jnp.ndarray:
    """Apply only the rotation of pose [..., 4, 4] to vectors [..., N, 3]."""
    return jnp.einsum("...ij,...nj->...ni", pose[..., :3, :3], vecs)


def to_world(pose_cam: jnp.ndarray, cam_pose: jnp.ndarray) -> jnp.ndarray:
    """Camera-frame object pose -> world frame (utilities.cpp:294-297)."""
    return compose(cam_pose, pose_cam)


def to_camera(pose_world: jnp.ndarray, cam_pose: jnp.ndarray) -> jnp.ndarray:
    """World-frame object pose -> camera frame (utilities.cpp:332-338)."""
    return compose(invert_pose(cam_pose), pose_world)


def quat_to_euler_xyz(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion -> (roll, pitch, yaw) radians.

    Same formulas as the reference's wikipedia-sourced toEulerianAngle
    (utilities.cpp:341-361): roll about x, pitch about y (asin, clamped),
    yaw about z.
    """
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    sinr = 2.0 * (w * x + y * z)
    cosr = 1.0 - 2.0 * (x * x + y * y)
    roll = jnp.arctan2(sinr, cosr)
    sinp = jnp.clip(2.0 * (w * y - z * x), -1.0, 1.0)
    pitch = jnp.arcsin(sinp)
    siny = 2.0 * (w * z + x * y)
    cosy = 1.0 - 2.0 * (y * y + z * z)
    yaw = jnp.arctan2(siny, cosy)
    return jnp.stack([roll, pitch, yaw], axis=-1)


def matrix_to_euler_xyz(m: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> euler XYZ via the quaternion path."""
    return quat_to_euler_xyz(matrix_to_quat(m))
