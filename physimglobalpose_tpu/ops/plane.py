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

    The INITIAL table frame (the reference's mean-z initial guess,
    SceneCfg.cpp:125-131); refine_table_pose below adds the reference's
    canonical-cloud ICP refinement (SceneCfg.cpp:134-146).
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


def canonical_table_cloud(
    half_extents: tuple[float, float, float], grid: int = 12
) -> jnp.ndarray:
    """Top-face grid of the table box in the surface frame (z = 0).

    The in-memory replacement for the reference's canonical `table.ply` asset
    (loaded at SceneCfg.cpp:109): a regular grid over the top face of the
    same 0.8 x 0.8 m table box the physics stage uses (PhySim.cpp:22-48).
    """
    hx, hy, _ = half_extents
    xs = jnp.linspace(-hx, hx, grid)
    ys = jnp.linspace(-hy, hy, grid)
    gx, gy = jnp.meshgrid(xs, ys, indexing="ij")
    return jnp.stack([gx.reshape(-1), gy.reshape(-1), jnp.zeros(grid * grid)], axis=-1)


def refine_table_pose(
    table_pose: jnp.ndarray,  # [4, 4] initial surface frame (z = plane normal)
    scene_pts: jnp.ndarray,  # [N, 3] scene points (same frame as table_pose)
    scene_mask: jnp.ndarray,  # [N] bool
    plane4: jnp.ndarray,  # [4] fitted plane
    half_extents: tuple[float, float, float],
    threshold: float = 0.005,
    iters: int = 50,
    max_corr_dist: float = 0.01,
) -> jnp.ndarray:
    """getTableParams parity (SceneCfg.cpp:87-157): refine the table frame by
    ICP of a canonical table-top cloud against the observed plane inliers.

    The reference aligns the scene onto a `table.ply` transformed by a mean-z
    initial guess (50 point-to-point ICP iterations, 1 cm correspondence cap)
    and applies the inverse correction to the table pose; here the batched
    ICP refines the table pose directly (model = canonical top-face grid,
    target = plane-inlier points). A planar model constrains tilt and height
    (what the physics settle depends on); in-plane translation stays anchored
    at the inlier centroid.
    """
    from physimglobalpose_tpu.ops import icp as icp_mod

    dist = jnp.abs(scene_pts @ plane4[:3] + plane4[3])
    inl = scene_mask & (dist < threshold)
    cloud = canonical_table_cloud(half_extents)
    refined = icp_mod.refine_icp(
        table_pose[None],
        cloud,
        jnp.zeros_like(cloud),  # normals unused in point-to-point mode
        scene_pts,
        inl,
        iters=iters,
        trim_fraction=0.8,
        max_corr_dist=max_corr_dist,
        point_to_plane=False,
    )
    return refined[0]
