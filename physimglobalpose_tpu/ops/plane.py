"""Batched RANSAC/MSAC plane fitting and table removal.

Reference: SceneCfg::removeTable (SceneCfg.cpp:38-82) voxel-downsamples the
scene to 5 mm, runs PCL SACSegmentation (MSAC) with a 5 mm threshold to find
the dominant plane, then zeroes every depth pixel whose 3D point is within
5 mm of that plane.

TPU design: all RANSAC trials evaluated in parallel — sample K point-triples
with one random draw, form K candidate planes, score all K x N point-plane
distances as one broadcasted op, argmin MSAC cost, then one refinement via
least-squares over inliers.
"""

from __future__ import annotations

from physimglobalpose_tpu import _jaxcfg  # noqa: F401  (platform/precision setup)
import jax
import jax.numpy as jnp


def fit_plane_ransac(
    points: jnp.ndarray,
    mask: jnp.ndarray,
    key: jax.Array,
    threshold: float = 0.005,
    iters: int = 256,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """MSAC plane fit.

    Args:
      points: [N, 3]; mask: [N] bool.
    Returns:
      plane: [4] (unit normal n, offset d) with n.p + d = 0.
      inliers: [N] bool (within threshold).
    """
    n = points.shape[0]
    probs = mask.astype(jnp.float32)
    probs = probs / jnp.maximum(probs.sum(), 1.0)
    idx = jax.random.choice(key, n, shape=(iters, 3), p=probs)
    tri = points[idx]  # [iters, 3, 3]
    v1 = tri[:, 1] - tri[:, 0]
    v2 = tri[:, 2] - tri[:, 0]
    nrm = jnp.cross(v1, v2)
    nrm_len = jnp.linalg.norm(nrm, axis=-1, keepdims=True)
    nrm = nrm / jnp.maximum(nrm_len, 1e-12)
    d = -jnp.sum(nrm * tri[:, 0], axis=-1)  # [iters]

    dist = jnp.abs(points @ nrm.T + d[None, :])  # [N, iters]
    dist = jnp.where(mask[:, None], dist, threshold)  # invalid: constant cost
    # MSAC cost: truncated squared distance.
    cost = jnp.sum(jnp.minimum(dist, threshold) ** 2, axis=0)
    # Degenerate triples (zero-area) get infinite cost.
    cost = jnp.where(nrm_len[:, 0] < 1e-9, jnp.inf, cost)
    best = jnp.argmin(cost)
    bn, bd = nrm[best], d[best]

    # One least-squares refinement over the consensus set: plane through the
    # inlier centroid with normal = smallest eigenvector of inlier covariance.
    inl = mask & (jnp.abs(points @ bn + bd) < threshold)
    w = inl.astype(jnp.float32)[:, None]
    cnt = jnp.maximum(w.sum(), 1.0)
    mean = jnp.sum(points * w, axis=0) / cnt
    cent = (points - mean) * w
    cov = cent.T @ cent / cnt
    _, vecs = jnp.linalg.eigh(cov)
    rn = vecs[:, 0]
    rn = rn * jnp.where(jnp.dot(rn, bn) < 0, -1.0, 1.0)
    rd = -jnp.dot(rn, mean)
    inliers = mask & (jnp.abs(points @ rn + rd) < threshold)
    return jnp.concatenate([rn, rd[None]]), inliers


def remove_table_depth(
    depth: jnp.ndarray,
    points: jnp.ndarray,
    valid: jnp.ndarray,
    plane: jnp.ndarray,
    threshold: float = 0.005,
) -> jnp.ndarray:
    """Zero depth pixels within threshold of the plane (SceneCfg.cpp:69-80).

    Args:
      depth: [H, W]; points: [H, W, 3] organized; valid: [H, W].
    """
    dist = jnp.abs(jnp.einsum("hwc,c->hw", points, plane[:3]) + plane[3])
    on_plane = valid & (dist < threshold)
    return jnp.where(on_plane, 0.0, depth)


def table_pose_from_plane(plane: jnp.ndarray, anchor: jnp.ndarray) -> jnp.ndarray:
    """A canonical SE(3) frame on the plane (z-axis = plane normal).

    Simplified analogue of getTableParams (SceneCfg.cpp:87-157), which ICP-fits
    a canonical table cloud; we build the frame directly from the fitted plane
    and the observed in-plane anchor (e.g. inlier centroid).
    Returns a [4, 4] pose whose z points along the plane normal.
    """
    z = plane[:3]
    z = z / jnp.linalg.norm(z)
    ref = jnp.where(jnp.abs(z[0]) < 0.9, jnp.array([1.0, 0.0, 0.0]), jnp.array([0.0, 1.0, 0.0]))
    x = jnp.cross(ref, z)
    x = x / jnp.linalg.norm(x)
    y = jnp.cross(z, x)
    rot = jnp.stack([x, y, z], axis=-1)
    # Project the anchor onto the plane for the origin.
    dist = jnp.dot(z, anchor) + plane[3]
    origin = anchor - dist * z
    top = jnp.concatenate([rot, origin[:, None]], axis=-1)
    return jnp.concatenate([top, jnp.array([[0.0, 0.0, 0.0, 1.0]])], axis=0)
