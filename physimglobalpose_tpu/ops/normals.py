"""k-NN PCA normal estimation, batched, with viewpoint orientation.

Replaces the reference's MLS normals (Segmentation.cpp:239-246, search radius
2 cm) with k-nearest-neighbor covariance PCA — the standard alternative; the
approximation is documented in SURVEY.md section 7 stage 2. Normals are
flipped toward the viewpoint exactly as flipNormalTowardsViewpoint does in
ObjectPoseCandidateSet.cpp:41-51 (viewpoint = camera origin).

Design: pairwise distances via one MXU matmul (N up to ~2k fits easily),
top-k neighbor gather, batched 3x3 eigen-decomposition via an analytic
closed-form solver (jnp.linalg.eigh on 3x3 batches is fine too; we use eigh —
XLA lowers small-batch eigh well).
"""

from __future__ import annotations

from physimglobalpose_tpu import _jaxcfg  # noqa: F401  (platform/precision setup)
import jax
import jax.numpy as jnp


def pairwise_sq_dists(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """[N,3] x [M,3] -> [N,M] squared distances (matmul-based, MXU)."""
    a2 = jnp.sum(a * a, axis=-1)
    b2 = jnp.sum(b * b, axis=-1)
    cross = a @ b.T
    return jnp.maximum(a2[:, None] + b2[None, :] - 2.0 * cross, 0.0)


def knn_normals(
    points: jnp.ndarray,
    mask: jnp.ndarray,
    k: int = 16,
    viewpoint: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """PCA normals from the k nearest valid neighbors.

    Args:
      points: [N, 3]; mask: [N] bool; viewpoint: [3] (default origin).
    Returns:
      normals: [N, 3], unit, oriented toward the viewpoint; zero for invalid.
    """
    n = points.shape[0]
    d2 = pairwise_sq_dists(points, points)
    big = jnp.float32(1e9)
    d2 = jnp.where(mask[None, :], d2, big)  # exclude invalid neighbors
    # (self-distance 0 keeps the point itself in its own neighborhood - fine for PCA)
    neg_d, idx = jax.lax.top_k(-d2, k)
    neigh = points[idx]  # [N, k, 3]
    w = (neg_d > -big * 0.5).astype(points.dtype)  # [N, k] valid-neighbor weights
    wsum = jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1.0)
    mean = jnp.sum(neigh * w[..., None], axis=-2) / wsum
    cent = (neigh - mean[:, None, :]) * w[..., None]
    cov = jnp.einsum("nki,nkj->nij", cent, cent) / wsum[..., None]
    # Smallest-eigenvalue eigenvector of each 3x3 covariance.
    eigvals, eigvecs = jnp.linalg.eigh(cov)
    normal = eigvecs[..., 0]  # ascending order -> first column
    # Orient toward viewpoint (ObjectPoseCandidateSet.cpp:41-51).
    vp = jnp.zeros(3, points.dtype) if viewpoint is None else viewpoint
    to_vp = vp[None, :] - points
    sign = jnp.where(jnp.sum(normal * to_vp, axis=-1, keepdims=True) < 0, -1.0, 1.0)
    normal = normal * sign
    norm = jnp.linalg.norm(normal, axis=-1, keepdims=True)
    normal = normal / jnp.maximum(norm, 1e-12)
    return jnp.where(mask[:, None], normal, 0.0)


def radius_outlier_mask(
    points: jnp.ndarray, mask: jnp.ndarray, radius: float, min_neighbors: int
) -> jnp.ndarray:
    """Radius outlier removal (ObjectPoseCandidateSet.cpp:28-33: 3 cm / 10).

    A point survives if it has >= min_neighbors valid neighbors (excluding
    itself) within radius.
    """
    d2 = pairwise_sq_dists(points, points)
    within = (d2 <= radius * radius) & mask[None, :]
    counts = jnp.sum(within, axis=-1) - mask.astype(jnp.int32)  # exclude self
    return mask & (counts >= min_neighbors)
